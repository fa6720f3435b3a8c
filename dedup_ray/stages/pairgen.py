"""Shared LSH-bucket pair generation: size-batched triu, cap, exact salting.

ONE kernel for every bucket->candidate-pairs stage in the engine (round-2
review: the flagship's skew-safe generator lived only in stages/lsh.py while
the document path re-implemented an uncapped per-run Python loop —
pipelines/text.py round-2 `_pairs_from_runs` — which was O(n^2) on a hot band
bucket. Both now route here).

Semantics per key-run of size n (rows arrive sorted by (key, id) from
stages/grouped.grouped_runs):

    n <= cap              all C(n,2) (a < b) pairs, one vectorized
                          triu_indices + fancy-index per DISTINCT run size
    n > cap, salted       the run was split BEFORE the shuffle into salted
                          rendezvous groups (apply_salt) whose triu pairs
                          regenerate the EXACT pair set, partitioned into
                          groups of ~2n/k <= cap rows
    n > cap, unsalted     star-from-min + chain: connectivity-preserving
                          O(n) degradation, counted in metrics

Duplicate pairs (cross-band, cross-salt-rendezvous) are emitted freely:
every consumer either verifies idempotently + union-finds (cluster paths)
or drops them with one distributed sorted-pair dedup (pair-output paths) —
the same contract the flagship established (stages/lsh.py lsh_candidates).

Hot-key counting offers two physical plans behind ``distributed=``:
driver-merged per-block partial counts (bounded by DISTINCT bucket keys —
fine on one node), or the at-scale shape: per-block partials ->
``groupby(key).sum(n)`` -> collect ONLY keys with count > cap (bounded by
the hot-bucket count, never the key-space). The flagship exposes the same
switch as ``DedupConfig.distributed_prepass`` (SCALE.md "prepass" row).
"""

from __future__ import annotations

import zlib
from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from dedup_ray.state.metrics import inc_counter

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _ids_np(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Id column -> numpy array preserving sort order: zero-copy for ints,
    object dtype for strings (np.sort/fancy-index both work)."""
    if pa.types.is_integer(col.type):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col.to_pylist(), dtype=object)


def _ids_arrow(a: np.ndarray, proto: pa.DataType) -> pa.Array:
    if pa.types.is_integer(proto):
        return pa.array(a, type=proto)
    return pa.array(list(a), type=proto)


def pairs_from_runs(
    key_col: str,
    id_col: str,
    cap: int | None,
    pair_filter: Callable[[pa.Table], Callable[[np.ndarray, np.ndarray], np.ndarray]]
    | None = None,
    out_cols: tuple[str, str] = ("src_id", "dst_id"),
    counter_prefix: str = "lsh",
    triu_filter: Callable[
        [pa.Table], Callable[[np.ndarray, np.ndarray], np.ndarray]
    ]
    | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Build the grouped_runs fn emitting (a < b) id pairs per key-run.

    ``pair_filter``: optional factory — called once per bucket table, returns
    a vectorized ``(gi, gj) -> keep`` mask over row-index pairs (the flagship
    uses it for the in-place phash Hamming re-check). Applied to BOTH the
    triu pairs and the star/chain fallback of over-cap buckets: a filtered
    pair cannot pass the corresponding verify check anyway, so post-verify
    edges are unchanged while the junk never rides the attach stage (the
    round-3 stress run shipped ~20M unfiltered star/chain pairs from 113k
    capped buckets into verify; all of them were Hamming-rejects there).

    ``triu_filter``: like ``pair_filter`` but applied ONLY to the in-cap
    triu pairs (after ``pair_filter``), never to the star/chain fallback —
    the broadcast cascade kernel uses it for exactly-once cross-combo
    emission, which must not suppress fallback pairs that no in-cap combo
    is guaranteed to regenerate.
    """

    def fn(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import run_starts

        id_type = g.schema.field(id_col).type
        schema = pa.schema([(out_cols[0], id_type), (out_cols[1], id_type)])
        if g.num_rows == 0:
            return schema.empty_table()
        keys = g[key_col].to_numpy(zero_copy_only=False)
        ids = _ids_np(g[id_col])
        per_pair = pair_filter(g) if pair_filter is not None else None
        per_triu = triu_filter(g) if triu_filter is not None else None

        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        sizes = np.diff(bounds)
        src_parts: list[np.ndarray] = []
        dst_parts: list[np.ndarray] = []
        # triu pairs for every in-cap run at once, batched BY RUN SIZE: one
        # triu_indices + one fancy-index per distinct size instead of one
        # Python iteration per run (profiled ~70 CPU-s/1.2M pairs saved)
        in_cap = sizes >= 2 if cap is None else (sizes >= 2) & (sizes <= cap)
        if in_cap.any():
            offs_all = bounds[:-1][in_cap]
            sz_all = sizes[in_cap]
            for s in np.unique(sz_all):
                offs = offs_all[sz_all == s]
                iu, ju = np.triu_indices(int(s), 1)
                gi = (offs[:, None] + iu[None, :]).ravel()
                gj = (offs[:, None] + ju[None, :]).ravel()
                if per_pair is not None:
                    keep = per_pair(gi, gj)
                    if not keep.all():
                        gi, gj = gi[keep], gj[keep]
                if per_triu is not None and gi.size:
                    keep = per_triu(gi, gj)
                    if not keep.all():
                        gi, gj = gi[keep], gj[keep]
                src_parts.append(ids[gi])
                dst_parts.append(ids[gj])
        if cap is not None:
            capped = 0
            capped_rows = 0
            for r in np.flatnonzero(sizes > cap):
                s, e = int(bounds[r]), int(bounds[r + 1])
                n = e - s
                capped += 1
                capped_rows += n
                # star-from-min + chain, as ROW INDICES so pair_filter applies
                gi = np.concatenate(
                    [np.full(n - 1, s, dtype=np.int64),
                     np.arange(s + 1, e - 1, dtype=np.int64)]
                )
                gj = np.concatenate(
                    [np.arange(s + 1, e, dtype=np.int64),
                     np.arange(s + 2, e, dtype=np.int64)]
                )
                if per_pair is not None:
                    keep = per_pair(gi, gj)
                    if not keep.all():
                        gi, gj = gi[keep], gj[keep]
                src_parts.append(ids[gi])
                dst_parts.append(ids[gj])
            if capped:
                inc_counter(f"{counter_prefix}_buckets_capped", capped)
                inc_counter(f"{counter_prefix}_capped_rows", capped_rows)
        if not src_parts:
            return schema.empty_table()
        return pa.table(
            {
                out_cols[0]: _ids_arrow(np.concatenate(src_parts), id_type),
                out_cols[1]: _ids_arrow(np.concatenate(dst_parts), id_type),
            }
        )

    return fn


# ---------------------------------------------------- global pair dedup


def _pair_hash(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Uniform uint64 per id — splitmix64 for ints, crc32 double-hash for
    strings. CONTRACT NOTE (round-4 advice): the string recipe is affinely
    degenerate (~32 bits of joint entropy per length class) — fine HERE
    because the hash only CO-LOCATES pairs into dedup buckets (the bucket
    kernel compares real ids; a collision never merges or drops a pair).
    Never reuse it where the hash is an identity — functions/vocab._hash62
    (blake2b) is the identity-grade recipe."""
    import zlib

    from dedup_ray.functions.hashing import splitmix64

    if pa.types.is_integer(col.type):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return splitmix64(col.to_numpy(zero_copy_only=False))
    vals = col.to_pylist()
    n = len(vals)
    lo = np.fromiter(
        (zlib.crc32(v.encode()) for v in vals), dtype=np.uint64, count=n
    )
    hi = np.fromiter(
        (zlib.crc32(v.encode(), 0x9E3779B9) for v in vals),
        dtype=np.uint64, count=n,
    )
    return splitmix64(((hi << np.uint64(32)) | lo).view(np.int64))


def dedup_pairs_global(
    pairs: rd.Dataset,
    out_cols: tuple[str, str] = ("src_id", "dst_id"),
    num_buckets: int = 256,
    counter_prefix: str = "lsh",
) -> rd.Dataset:
    """Distinct (a, b) pairs via ONE hash-partitioned shuffle.

    The scale counterpart of the within-batch dedup: a true dup pair is
    generated by every band/combo/anchor that collides (~30-70x measured at
    2M rows), and each surviving copy pays the attach+verify kernels. This
    stage keys each pair on a mixed endpoint hash (equal pairs co-locate by
    construction; the asymmetric mix spreads hot endpoints — a capped
    bucket's star source — uniformly), sorts each bucket by (a, b) and
    keeps first occurrences. Exact: the pair SET entering verify is
    unchanged, each member once. Shuffle payload is the pair rows + one
    int64 key — with int-coded ids ~24 B/row."""
    from dedup_ray.stages.grouped import drop_sorted_dup_pairs, grouped_runs

    a_col, b_col = out_cols

    def add_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__pkey__", pa.array([], type=pa.int64()))
        with np.errstate(over="ignore"):
            key = (_pair_hash(b[a_col]) * _MIX) ^ _pair_hash(b[b_col])
        return b.append_column("__pkey__", pa.array(key.view(np.int64)))

    keyed = pairs.map_batches(add_key, batch_format="pyarrow")

    def drop_dups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.drop_columns(["__pkey__"])
        out = drop_sorted_dup_pairs(g, a_col, b_col)
        dropped = g.num_rows - out.num_rows
        if dropped:
            inc_counter(f"{counter_prefix}_pairs_deduped", dropped)
        return out.drop_columns(["__pkey__"])

    return grouped_runs(
        keyed, "__pkey__", drop_dups, num_buckets=num_buckets,
        sort_cols=[a_col, b_col],
    )


# ------------------------------------------------- hot-key count pre-pass


def bucket_counts(
    buckets: rd.Dataset, key_col: str, distributed: bool = False
) -> tuple[np.ndarray, np.ndarray] | None:
    """Global (distinct_key_sorted, count) over a bucket dataset, shuffle-free.

    Default: per-block partial (key, n) counts merged on the driver — driver
    state bounded by DISTINCT bucket keys (reps x bands), never rows.
    ``distributed=True`` is the at-scale shape: the partials go through ONE
    ``groupby(key).sum(n)`` exchange and the driver reads back the already-
    aggregated distinct-key table (use ``hot_bucket_counts`` to read back
    only the over-cap slice)."""

    def partial_counts(b: pa.Table) -> pa.Table:
        u, c = np.unique(b[key_col].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"k": pa.array(u), "n": pa.array(c)})

    partials = buckets.map_batches(partial_counts, batch_format="pyarrow")
    if distributed:
        # the engine's own hash exchange + per-run reduceat — NOT Ray Data's
        # groupby (its sort-based aggregate was measured at 841 s over ~90M
        # partial rows in the round-5 2M cell; grouped_runs moves the same
        # rows through one coarse hash partition and sums each key-run with
        # one vectorized reduceat)
        from dedup_ray.stages.grouped import grouped_runs, run_starts

        def sum_runs(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return g
            k = g["k"].to_numpy(zero_copy_only=False)
            n = g["n"].to_numpy(zero_copy_only=False)
            starts = run_starts(k)
            return pa.table(
                {"k": pa.array(k[starts]),
                 "n": pa.array(np.add.reduceat(n, starts))}
            )

        agg = grouped_runs(partials, "k", sum_runs, sort_cols=["k"])
        parts = [x for x in ray.get(agg.to_arrow_refs()) if x.num_rows]
        if not parts:
            return None
        t = pa.concat_tables(parts)
        u = t["k"].to_numpy(zero_copy_only=False)
        tot = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(u)
        return u[order], tot[order]
    parts = [
        t
        for t in ray.get(partials.to_arrow_refs())
        if t.num_rows and "k" in t.column_names
    ]
    if not parts:
        return None
    from dedup_ray.stages.grouped import merge_partial_counts

    merged = pa.concat_tables(parts)
    return merge_partial_counts(
        merged["k"].to_numpy(zero_copy_only=False),
        merged["n"].to_numpy(zero_copy_only=False),
    )


def hot_bucket_counts(
    buckets: rd.Dataset, key_col: str, cap: int, distributed: bool = False
) -> tuple[np.ndarray, np.ndarray] | None:
    """(sorted_hot_keys, their_counts) for keys with count > cap, or None.

    In distributed mode the over-cap filter runs INSIDE the count exchange,
    so the driver collects only the hot slice — bounded by the number of hot
    buckets (tiny by construction), valid at any key-space size."""
    if distributed:
        from dedup_ray.stages.grouped import grouped_runs, run_starts

        def partial_counts(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b[key_col].to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table({"k": pa.array(u), "n": pa.array(c)})

        def over_cap_runs(g: pa.Table) -> pa.Table:
            # the over-cap filter runs INSIDE the exchange kernel, so only
            # the hot slice travels back to the driver (same contract as the
            # previous Ray-groupby plan, minus its measured 841 s sort cost)
            if g.num_rows == 0:
                return g
            k = g["k"].to_numpy(zero_copy_only=False)
            n = g["n"].to_numpy(zero_copy_only=False)
            starts = run_starts(k)
            sums = np.add.reduceat(n, starts)
            over = sums > cap
            return pa.table(
                {"k": pa.array(k[starts][over]), "n": pa.array(sums[over])}
            )

        hot_t = grouped_runs(
            buckets.map_batches(partial_counts, batch_format="pyarrow"),
            "k",
            over_cap_runs,
            sort_cols=["k"],
        )
        parts = [t for t in ray.get(hot_t.to_arrow_refs()) if t.num_rows]
        if not parts:
            return None
        t = pa.concat_tables(parts)
        u = t["k"].to_numpy(zero_copy_only=False)
        tot = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(u)
        return u[order], tot[order]
    counts = bucket_counts(buckets, key_col, distributed=False)
    if counts is None:
        return None
    u, tot = counts
    hot = tot > cap
    if not hot.any():
        return None
    return u[hot], tot[hot]


# ---------------------------------------------------------- exact salting


def _salt_values(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic (process-independent) per-row salt hash. Strings use
    crc32 (the flagship's historical choice — checkpoint-resume stability);
    ints one Fibonacci-mix pass (vectorized)."""
    if pa.types.is_integer(ids.type):
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        a = ids.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return ((a.view(np.uint64) * _MIX) >> np.uint64(33)).astype(np.int64)
    vals = ids.to_pylist()
    return np.fromiter(
        (zlib.crc32(x.encode()) for x in vals), dtype=np.int64, count=len(vals)
    )


def apply_salt(
    buckets: rd.Dataset,
    key_col: str,
    id_col: str,
    hot_keys: np.ndarray,
    hot_counts: np.ndarray,
    cap: int,
    slack: int = 4,
    counter_prefix: str = "lsh",
) -> rd.Dataset:
    """EXACT hot-bucket salting (north-rule named feature; SURVEY §4 skew).

    Each hot-bucket row (salt s = hash(id) % k, k = ceil(slack*n/cap)) is
    re-emitted into every rendezvous group p(min(s,t), max(s,t)) for t in
    0..k-1 — pairs WITHIN salt s arise in the diagonal group (s,s), pairs
    ACROSS salts s<t in group (s,t), so triu over each rendezvous group
    regenerates the complete pair set, just partitioned into groups of
    ~2n/k <= cap rows (duplicates absorbed downstream). Cold rows pass
    through untouched. ``hot_keys`` must be sorted ascending."""
    hot_k = np.ceil(slack * hot_counts / cap).astype(np.int64)
    inc_counter(f"{counter_prefix}_buckets_salted", int(hot_keys.size))
    hot_ref = ray.put((hot_keys, hot_k))

    def add_salt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        hot_c, hot_kk = ray.get(hot_ref)
        key = b[key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot_c, key)
        pos[pos >= hot_c.size] = hot_c.size - 1
        is_hot = hot_c[pos] == key
        cold = b.filter(pa.array(~is_hot))
        hi = np.flatnonzero(is_hot)
        if hi.size == 0:
            return cold
        ks = hot_kk[pos[hi]]
        salts = _salt_values(b[id_col].take(pa.array(hi))) % ks
        # expand: row i -> k_i rendezvous groups (its salt vs every t)
        rep = np.repeat(np.arange(hi.size), ks)
        t_idx = np.concatenate([np.arange(k) for k in ks])
        s_rep = salts[rep]
        lo = np.minimum(s_rep, t_idx)
        hh = np.maximum(s_rep, t_idx)
        p = hh * (hh + 1) // 2 + lo  # triangular index of the salt pair
        key2 = (
            key[hi][rep].astype(np.int64).view(np.uint64)
            ^ ((p.astype(np.uint64) + np.uint64(1)) * _MIX)
        ).view(np.int64)
        hot_tbl = b.take(pa.array(hi[rep]))
        hot_tbl = hot_tbl.set_column(
            hot_tbl.schema.get_field_index(key_col), key_col, pa.array(key2)
        )
        return pa.concat_tables([cold, hot_tbl]) if cold.num_rows else hot_tbl

    return buckets.map_batches(add_salt, batch_format="pyarrow")


def salted_candidate_pairs(
    buckets: rd.Dataset,
    key_col: str,
    id_col: str,
    cap: int = 64,
    slack: int = 4,
    strict: bool = True,
    distributed_counts: bool = False,
    out_cols: tuple[str, str] = ("src_id", "dst_id"),
    counter_prefix: str = "docs_lsh",
) -> rd.Dataset:
    """Bucket rows -> candidate pairs, skew-safe and (with strict) EXACT.

    The document-path entry point (MinHash bands, SimHash bands, ngram
    prefix groups): one hot-key count pre-pass, exact salting of over-cap
    buckets, then ONE coarse hash-partitioned shuffle with the shared
    vectorized pair kernel. ``strict=True`` keeps full triu even on a salted
    sub-run that still exceeds ``cap`` (expected size ~cap/2, so the O(n^2)
    bound is ~cap^2 worst-case per group) — required when the output pair
    set feeds an EXACT operator (ngram prefix filtering) or an
    oracle-checked pair listing; ``strict=False`` degrades such runs to
    star+chain like the flagship's unsalted fallback."""
    from dedup_ray.stages.grouped import grouped_runs

    hot = hot_bucket_counts(buckets, key_col, cap, distributed=distributed_counts)
    if hot is not None:
        buckets = apply_salt(
            buckets, key_col, id_col, hot[0], hot[1], cap, slack,
            counter_prefix=counter_prefix,
        )
    fn = pairs_from_runs(
        key_col,
        id_col,
        cap=None if strict else cap,
        out_cols=out_cols,
        counter_prefix=counter_prefix,
    )
    return grouped_runs(buckets, key_col, fn, sort_cols=[key_col, id_col])
