"""Attach (lookup-join) helpers.

Candidate pairs need per-endpoint attributes (phash, minhash_sig, caption)
for verification. Two strategies, chosen by the small side's size
(ray_guide "Joins and lookups"):

* broadcast — ``ray.put`` the attribute table ONCE, every verify task reads
  the shared object-store copy and look ups are a numpy/dict probe per batch.
  No shuffle. Right for side tables that fit a worker's heap (after the
  exact-tier collapse the rep table is drastically smaller than the corpus).
* shuffle — ``Dataset.join`` (hash-partitioned) twice, once per endpoint.
  The 100 TB path: pairs and attrs are both hash-partitioned on the id, only
  (id, sig, phash, caption) rows move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int = 256,
    salt: int = 1,
    left_schema=None,
    right_schema=None,
) -> rd.Dataset:
    """Big-big hash join: ONE co-partitioning shuffle, vectorized per bucket.

    Both sides are tagged, widened to a shared schema and unioned, so the
    coarse hash-partition shuffle (``grouped_runs``) moves each side exactly
    once and co-locates equal keys; per bucket the join is two
    ``np.searchsorted`` calls + ``take`` — no per-key Python, no driver
    materialization. This is the 100 TB path when NEITHER side fits a
    worker's heap (otherwise use the broadcast probes in
    ``pipelines/relational.py``); ``num_buckets`` bounds per-task memory,
    raise it at scale so a bucket of both sides fits a worker.

    ``how``: ``"inner"`` (many-to-many, emits key + left cols + right cols),
    ``"left"`` (inner plus unmatched left rows with null right cols),
    ``"right"`` (inner plus unmatched right rows with null left cols),
    ``"full"`` (inner plus unmatched rows from BOTH sides),
    ``"semi"`` (left rows with >=1 right match; right cols dropped,
    duplicate right keys collapse) or ``"anti"`` (left rows with NO right
    match). Non-key column names must be disjoint.

    ``salt`` > 1 is the hot-key mitigation (north-rule skew pattern): left
    rows of every key are round-robined across ``salt`` sub-keys and right
    rows are replicated to all of them, so one hot key's work spreads over
    ``salt`` tasks instead of one. Output is EXACT for all three modes (each
    left row meets each matching right row exactly once — in its own salt);
    the cost is shipping the right side ``salt`` times, so salt the smaller
    side right. Generalizes the reference's in-process HashMap lookups
    (/root/reference/src/grouping.rs:13-24) to two distributed inputs.
    """
    from dedup_ray.stages.grouped import coarse_hash, grouped_runs

    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|right|full|semi|anti, got {how!r}"
        )
    if how in ("right", "full") and salt > 1:
        # a right row is replicated to every salt but a MATCHING left row
        # lives in only one of them, so per-salt right-miss detection would
        # emit false unmatched-right rows — the exactness argument that holds
        # for inner/left/semi/anti does not extend here
        raise ValueError(f"how={how!r} does not compose with salt > 1")
    right_on = right_on or on
    # Dataset.schema() on a shuffle lineage (groupby/map_groups output)
    # cannot be answered from metadata and EXECUTES the upstream plan —
    # callers chaining joins pass explicit schemas (pyarrow.Schema or
    # ray.data Schema, both expose .names/.types) to stay lazy
    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    if ltypes[on] != rtypes[right_on]:
        raise ValueError(f"join key dtype mismatch: {ltypes[on]} vs {rtypes[right_on]}")
    lval = [c for c in ls.names if c != on]
    rval = [c for c in rs.names if c != right_on]
    clash = set(lval) & set(rval)
    if clash:
        raise ValueError(f"non-key column collision: {sorted(clash)}")
    if on in rval:
        raise ValueError(
            f"right side has a non-key column named like the left key {on!r}"
        )
    reserved = {"__side__", "__salt__", "__jkey__", "__coarse__"}
    bad = reserved & (set(ls.names) | set(rs.names))
    if bad:
        raise ValueError(f"reserved column names in join inputs: {sorted(bad)}")

    def widen(b: pa.Table, side: int) -> pa.Table:
        khash = None
        if salt > 1:
            # hash original keys ONCE (string crc32 is the expensive part),
            # before any replication
            khash = coarse_hash(b[on if side == 0 else right_on], 1 << 31)
        if salt > 1 and side == 1:
            # replicate the right side once per salt (contiguous repeat keeps
            # per-key row order stable for determinism)
            idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), salt)
            b = b.take(pa.array(idx))
            khash = np.repeat(khash, salt)
        n = b.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            on: b[on if side == 0 else right_on]
        }
        for c in lval:
            cols[c] = b[c] if side == 0 else pa.nulls(n, type=ltypes[c])
        for c in rval:
            cols[c] = pa.nulls(n, type=rtypes[c]) if side == 0 else b[c]
        cols["__side__"] = pa.array(np.full(n, side, dtype=np.int8))
        if salt > 1:
            if side == 0:
                sv = np.arange(n, dtype=np.int64) % salt  # round-robin split
            else:
                sv = np.tile(np.arange(salt, dtype=np.int64), n // salt)
            cols["__salt__"] = pa.array(sv)
            cols["__jkey__"] = pa.array(khash * salt + sv)
        return pa.table(cols)

    both = left.map_batches(
        lambda b: widen(b, 0), batch_format="pyarrow"
    ).union(right.map_batches(lambda b: widen(b, 1), batch_format="pyarrow"))

    out_cols = [on] + lval + ([] if how in ("semi", "anti") else rval)
    empty = pa.schema(
        [(c, ltypes.get(c) or rtypes[c]) for c in out_cols]
    ).empty_table()

    def join_sorted(g: pa.Table) -> pa.Table:
        """Join one table sorted by (key, side) — all rows of a (key [, salt])
        group."""
        side = g["__side__"].to_numpy(zero_copy_only=False)
        keys = g[on].to_numpy(zero_copy_only=False)
        lmask = side == 0
        lk, rk = keys[lmask], keys[~lmask]
        ltab = g.filter(pa.array(lmask)).select([on] + lval)

        def matched() -> np.ndarray:
            """Sorted-membership mask: which left keys have >=1 right match
            (shared by semi/anti/left so the modes can't disagree)."""
            if len(rk) == 0:
                return np.zeros(len(lk), dtype=bool)
            pos = np.minimum(np.searchsorted(rk, lk), len(rk) - 1)
            return rk[pos] == lk

        if how in ("semi", "anti"):
            if len(lk) == 0:
                return empty
            hit = matched()
            return ltab.filter(pa.array(hit if how == "semi" else ~hit))
        rtab = g.filter(pa.array(~lmask)).select(rval)
        lo = np.searchsorted(lk, rk, side="left")
        hi = np.searchsorted(lk, rk, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        inner = None
        if total:
            ridx = np.repeat(np.arange(len(rk), dtype=np.int64), cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            lidx = np.arange(total, dtype=np.int64) + np.repeat(lo - offs, cnt)
            inner = ltab.take(pa.array(lidx, type=pa.int64()))
            rtaken = rtab.take(pa.array(ridx, type=pa.int64()))
            for c in rval:
                inner = inner.append_column(c, rtaken[c])
        if how in ("left", "full") and len(lk):
            # unmatched left rows survive with null right columns; exact
            # under salting too (a left row lives in exactly ONE salt, with
            # a full right replica there)
            miss = ltab.filter(pa.array(~matched()))
            if miss.num_rows:
                for c in rval:
                    miss = miss.append_column(c, pa.nulls(miss.num_rows, type=rtypes[c]))
                inner = (
                    miss if inner is None
                    else pa.concat_tables([inner, miss])
                )
        if how in ("right", "full") and len(rk):
            # unmatched right rows survive with null left columns (salt > 1
            # is rejected up front, so the bucket holds ALL left rows of the
            # key and the miss test is global)
            if len(lk) == 0:
                rmiss_mask = np.ones(len(rk), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(lk, rk), len(lk) - 1)
                rmiss_mask = lk[pos] != rk
            if rmiss_mask.any():
                rside = g.filter(pa.array(~lmask)).filter(pa.array(rmiss_mask))
                cols: dict[str, pa.Array | pa.ChunkedArray] = {on: rside[on]}
                for c in lval:
                    cols[c] = pa.nulls(rside.num_rows, type=ltypes[c])
                for c in rval:
                    cols[c] = rside[c]
                rmiss_t = pa.table(cols)
                inner = (
                    rmiss_t if inner is None
                    else pa.concat_tables([inner, rmiss_t])
                )
        return empty if inner is None else inner

    def join_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        if salt <= 1:
            return join_sorted(g)
        # a bucket may hold several (key-hash, salt) groups, including the
        # SAME key under different salts (each with its own right replica) —
        # join per salt so a left row meets each right match exactly once
        sv = g["__salt__"].to_numpy(zero_copy_only=False)
        parts = [
            join_sorted(g.filter(pa.array(sv == s)))
            for s in np.unique(sv)
        ]
        parts = [p for p in parts if p.num_rows]
        return pa.concat_tables(parts) if parts else empty

    if salt > 1:
        return grouped_runs(
            both, "__jkey__", join_bucket, num_buckets=num_buckets,
            sort_cols=[on, "__salt__", "__side__"],
        )
    return grouped_runs(
        both, on, join_bucket, num_buckets=num_buckets,
        sort_cols=[on, "__side__"],
    )


ATTACH_BROADCAST_MAX_ROWS = 2_000_000


_ATTACH_CACHE: dict[bytes, tuple[dict, pa.Table]] = {}


class _BroadcastAttacher:
    """Broadcast lookup resolved from the shared object ref once per worker
    PROCESS (module cache keyed by the ref) — stateless elastic tasks, no
    actor pool ramp-up. The object-store read itself is zero-copy; only the
    id->row index build is cached."""

    def __init__(
        self, attrs_ref: ray.ObjectRef, columns: list[str], post_fn=None
    ) -> None:
        self.ref = attrs_ref
        self.columns = columns
        self.post_fn = post_fn

    def _lookup(self):
        import pandas as pd

        refs = self.ref if isinstance(self.ref, list) else [self.ref]
        key = b"".join(r.binary() for r in refs)
        got = _ATTACH_CACHE.get(key)
        if got is None:
            tables = [t for t in ray.get(refs) if t.num_rows]
            # combine_chunks is LOAD-BEARING: Table.take against a
            # many-chunked concat (one chunk per upstream block) runs ~100x
            # slower than against contiguous arrays (profiled 87 us/row vs
            # <1 us/row at 2048-row batches) — pay one copy at build time
            attrs: pa.Table = pa.concat_tables(tables).combine_chunks()
            if pa.types.is_integer(attrs.schema.field("image_id").type):
                # int-code ids (stages/codes.py): DENSE ranks 0..n-1, so the
                # probe is one permutation-array gather — no hash index at all
                codes = attrs["image_id"].to_numpy(zero_copy_only=False)
                index = np.full(int(codes.max()) + 1, -1, dtype=np.int64)
                index[codes] = np.arange(len(codes), dtype=np.int64)
            else:
                index = pd.Index(attrs["image_id"].to_pylist())  # C-speed probes
            got = (index, attrs)
            _ATTACH_CACHE.clear()  # hold at most one corpus index per worker
            _ATTACH_CACHE[key] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty blocks may arrive with a DROPPED schema (no src_id/dst_id)
            # from an upstream groupby; pass them through untouched
            return batch if self.post_fn is None else self.post_fn(batch)
        index, attrs = self._lookup()
        out = batch
        for side in ("src", "dst"):
            if isinstance(index, np.ndarray):
                col = batch[f"{side}_id"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                rows = index[col.to_numpy(zero_copy_only=False)]
            else:
                rows = index.get_indexer(batch[f"{side}_id"].to_pylist())
            taken = attrs.take(pa.array(rows, type=pa.int64()))
            for col in self.columns:
                out = out.append_column(f"{side}_{col}", taken[col])
        # fused consumer (usually the verifier): the attached columns —
        # ~kilobytes per pair against tens of bytes for the pair itself —
        # are reduced to the consumer's (tiny) output INSIDE this task and
        # never cross the object store. Profiled at 2M rows / 56M candidate
        # pairs: the unfused attach->verify boundary shipped ~145 GB of
        # attached batches through the store (the spill driver; the
        # stage-split profile run overflowed the disk outright).
        return out if self.post_fn is None else self.post_fn(out)


def attach_pair_attrs(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    columns: list[str],
    broadcast_max_rows: int = ATTACH_BROADCAST_MAX_ROWS,
    num_partitions: int = 64,
    post_fn=None,
    batch_size: int = 4096,
    attrs_count: int | None = None,
    pairs_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """pairs(src_id, dst_id, ...) + attrs(image_id, ...) ->
    pairs + {src,dst}_{col...}.

    Strategy auto-selected on the attr row count (a cheap metadata count for
    checkpointed parquet inputs).

    ``post_fn``: optional per-batch reducer (typically the pair VERIFIER)
    applied to each attached batch INSIDE the attach task. Attached batches
    are ~kilobytes per pair (signatures + captions on both endpoints) while
    verify output is tens of bytes per CONFIRMED pair, so fusing the
    consumer keeps that blow-up out of the object store — differing
    batch_size settings otherwise prevent Ray's map fusion between the two
    stages, and at 56M candidate pairs the unfused boundary measured
    ~145 GB of transient store traffic (the round-3 spill-stress driver).

    ``batch_size``: rows per attach (and therefore fused-``post_fn``) batch
    on the broadcast path — exposed so a fused verifier can keep its own
    batch sizing (round-3 advice: fusing silently moved verify from 2048 to
    the attach default).

    ``attrs_count``: pass the known attr row count when ``attrs`` is a lazy
    lineage over a pinned table (e.g. the int-encode projection) — avoids a
    count() that would execute that lineage once just for the strategy
    decision.

    ``pairs_schema``: pass the (statically known) pair schema when the
    shuffle path may engage — ``Dataset.schema()`` on an unmaterialized
    shuffle lineage EXECUTES it (observed at the 4M-row stress cell: the
    whole pair-generation shuffle ran once for schema inference, then again
    for the join, spilling the disk dry)."""
    n = attrs_count if attrs_count is not None else attrs.count()
    if n <= broadcast_max_rows:
        # pass the block REFS, not a driver-concatenated copy: workers pull
        # shared object-store blocks directly (no driver round-trip, no
        # duplicate copy of the attrs table)
        refs = list(attrs.select_columns(["image_id"] + columns).to_arrow_refs())
        attacher = _BroadcastAttacher(refs, columns, post_fn=post_fn)
        return pairs.map_batches(
            attacher, batch_format="pyarrow", batch_size=batch_size
        )
    # shuffle path: two co-partitioned hash joins through the same
    # grouped_runs machinery as every other wide stage (Dataset.join carries
    # ~10-20 s fixed aggregator cost per call; shuffle_join does not).
    # Schemas are threaded explicitly so the second join does NOT call
    # .schema() on the first join's shuffle lineage (which would execute it
    # eagerly at stage-construction time).
    side = attrs.select_columns(["image_id"] + columns)
    atypes = dict(zip(attrs.schema().names, attrs.schema().types))
    left_schema = pairs_schema if pairs_schema is not None else pairs.schema()
    out = pairs
    for endpoint in ("src", "dst"):
        renamed = side.map_batches(
            lambda b, ep=endpoint: b.rename_columns(
                ["image_id"] + [f"{ep}_{c}" for c in columns]
            ),
            batch_format="pyarrow",
        )
        right_schema = pa.schema(
            [("image_id", atypes["image_id"])]
            + [(f"{endpoint}_{c}", atypes[c]) for c in columns]
        )
        out = shuffle_join(
            out, renamed, on=f"{endpoint}_id", right_on="image_id",
            num_buckets=num_partitions,
            left_schema=left_schema, right_schema=right_schema,
        )
        # the next join's left side = this join's output: key first, then
        # the remaining left columns, then the attached right columns —
        # derived statically, mirroring shuffle_join's out_cols order
        key = f"{endpoint}_id"
        ltypes = dict(zip(left_schema.names, left_schema.types))
        left_schema = pa.schema(
            [(key, ltypes[key])]
            + [(n, t) for n, t in zip(left_schema.names, left_schema.types) if n != key]
            + [(f.name, f.type) for f in right_schema if f.name != "image_id"]
        )
    if post_fn is not None:
        # shuffle path: the reducer runs right after the second join's
        # bucket tasks (the join output still crosses the store once — the
        # join IS a shuffle — but the verify blow-down happens before any
        # further stage boundary)
        out = out.map_batches(post_fn, batch_format="pyarrow")
    return out


# --------------------------------------------------------- bloom prefilter

BLOOM_BITS = 1 << 23   # 1 MiB of bits; ~1% FP at ~8.4e5 distinct keys
BLOOM_HASHES = 4


def _key_hash64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Uniform uint64 hash per key — splitmix64 for integers, crc32 double
    hash for strings. CONTRACT NOTE (round-4 advice): the crc32 recipe is
    affinely degenerate (hi == lo ^ f(len)), so it carries ~32 bits of joint
    entropy per length class. That is acceptable HERE and only here-like
    sites: the hash merely PARTITIONS/prefilters — a collision costs shuffle
    bytes (a bloom false positive), never correctness. It must NOT be used
    where the hash is an IDENTITY (see functions/vocab._hash62, which uses
    blake2b for exactly that reason). Callers must drop nulls first (a null
    join key never matches anything in an inner/semi join)."""
    import zlib

    from dedup_ray.functions.hashing import splitmix64

    if pa.types.is_integer(col.type):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return splitmix64(col.to_numpy(zero_copy_only=False))
    vals = col.to_pylist()
    lo = np.fromiter(
        (zlib.crc32(v.encode()) for v in vals), dtype=np.uint64, count=len(vals)
    )
    hi = np.fromiter(
        (zlib.crc32(v.encode(), 0x9E3779B9) for v in vals),
        dtype=np.uint64, count=len(vals),
    )
    return splitmix64(((hi << np.uint64(32)) | lo).view(np.int64))


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 mod m."""
    with np.errstate(over="ignore"):
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full-cycle stride
        return np.stack(
            [((h + np.uint64(i) * h2) & np.uint64(m_bits - 1)) for i in range(k)],
            axis=1,
        )


def build_key_bloom(
    ds: rd.Dataset, key: str, m_bits: int = BLOOM_BITS, k: int = BLOOM_HASHES
) -> np.ndarray:
    """Distributed Bloom filter of a key column: each batch emits a partial
    bitmap (one packed-binary row), the driver ORs them — data moved is
    O(blocks × m_bits/8), never the keys. Returns the uint64 word array."""

    def partial(b: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        keys = b[key].drop_null() if b.num_rows else b[key]
        if len(keys):
            pos = _bloom_positions(_key_hash64(keys), m_bits, k).reshape(-1)
            np.bitwise_or.at(
                words, pos >> np.uint64(6),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"bits": pa.array([words.tobytes()], type=pa.binary())})

    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for t in ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()):
        if t.num_rows and "bits" in t.column_names:
            for blob in t["bits"].to_pylist():
                acc |= np.frombuffer(blob, dtype=np.uint64)
    return acc


def bloom_prefilter(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    right_on: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> rd.Dataset:
    """Drop left rows whose key CANNOT appear on the right (no false
    negatives: a Bloom miss proves absence) before an inner/semi
    shuffle_join — the standard shuffle-volume reducer when the left side
    is huge and the right key set is modest. False positives just ride the
    shuffle and fall out in the exact per-bucket join, so composing this
    with how='inner'/'semi' is output-identical (tested). NOT sound for
    left/full/anti (missed rows must still be emitted / proven unmatched).

    The right side is scanned once here (project it to the key column) and
    again by the join itself; at scale that trade wins whenever
    bytes(left dropped) >> bytes(right key column)."""
    words_ref = ray.put(build_key_bloom(right_keys, right_on, m_bits, k))

    def probe(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        words = ray.get(words_ref)
        valid = pa.compute.is_valid(b[on]).to_numpy(zero_copy_only=False)
        keep = np.zeros(b.num_rows, dtype=bool)  # null key = proven no-match
        if valid.any():
            pos = _bloom_positions(
                _key_hash64(b[on].drop_null()), m_bits, k
            )
            bits = (
                (words[pos >> np.uint64(6)] >> (pos & np.uint64(63)))
                & np.uint64(1)
            )
            keep[valid] = bits.all(axis=1)
        return b.filter(pa.array(keep))

    return left.map_batches(probe, batch_format="pyarrow")
