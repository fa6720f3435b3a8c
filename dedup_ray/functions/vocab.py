"""Global token ordering for prefix-filter AllPairs (Bayardo WWW'07).

The prefix filter needs a TOTAL order on tokens — ANY order is lossless;
rarest-first minimizes candidates. Two physical plans (round-2 review #5):

* ``exact_token_order`` — exact document frequencies: per-block partial
  (token, n) counts, ONE driver merge, ranks broadcast as a lex-sorted
  token array + a rank array. Probing is pure Arrow C++ (``pc.index_in``)
  + one numpy gather — no Python dict, no per-gram Python (the round-2
  implementation probed a broadcast dict in a per-doc loop). Driver state
  is bounded by the VOCABULARY — fine up to ~10^8 distinct tokens.

* ``mg_token_order`` — the unbounded-vocabulary fallback: a distributed
  Misra-Gries top-k summary (per-block exact counts MG-compressed to k
  entries; driver merges the ≤k·blocks entries and re-compresses — every
  token with true count ≥ N/k is guaranteed present). Only the ~frequent
  tokens are materialized; everything else gets a 62-bit content hash.
  The total order is (infrequent-by-hash first, then MG-frequent by
  ascending estimated count) — frequent tokens land LAST, so prefix
  groups stay small, and the pair set is IDENTICAL to exact mode's
  because the prefix filter is lossless under any order (pytest-checked).
  Token IDENTITY (verification ids) in this mode is the content hash
  (collision odds ~n²/2^62 — the documented trade of the fallback).

Both return a broadcastable ``TokenOrder`` whose ``probe`` maps a flat
Arrow string array to (order_key, tok_id) int64 arrays vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_FREQ_BASE = np.int64(1) << np.int64(62)


def _hash62(flat: pa.Array) -> np.ndarray:
    """Deterministic 62-bit string hash, self-contained (round-3 advice:
    the previous polars-ahash version tied token identity to the installed
    polars VERSION — a mixed-version cluster or an upgrade between a run
    and a checkpoint resume would silently change ids mid-run).

    blake2b(digest_size=8) per token: stdlib-only, process- and
    version-stable, and a TRUE 64-bit hash. In mg mode this value IS token
    identity, so its entropy bounds the false-merge odds at the fallback's
    design scale (10^6-10^8 distinct tokens) — the round-4-advice reason a
    crc32 double-hash is NOT acceptable here: crc32 is GF(2)-affine in the
    seed, so crc32(v, s) == crc32(v, 0) ^ f(s, len(v)) and any two-seed /
    prefix / suffix crc32 recipe carries only ~32 bits of joint entropy per
    length class (collision odds ~n^2/2^33). The crc32 recipe survives in
    stages/join._key_hash64 and stages/pairgen._pair_hash, where hashes only
    PARTITION (a collision co-locates two keys in one bucket, never merges
    identities) — a different contract, noted at both sites."""
    from hashlib import blake2b

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vals = flat.to_pylist()
    n = len(vals)
    h = np.fromiter(
        (
            int.from_bytes(blake2b(v.encode(), digest_size=8).digest(), "little")
            for v in vals
        ),
        dtype=np.uint64,
        count=n,
    )
    return (h >> np.uint64(2)).astype(np.int64)


@dataclass
class TokenOrder:
    """Broadcast once (ray.put); probed per batch with Arrow kernels."""

    tokens_lex: pa.Array          # lex-sorted known tokens (vocab or MG top-k)
    order_lex: np.ndarray         # per lex position: total-order key
    ids_lex: np.ndarray | None    # per lex position: identity id (None = order)
    hash_unknown: bool            # True: tokens not in tokens_lex get hash ids
    vocab_n: int | None           # exact mode: |vocab|+1 (dense id space)

    def probe(self, flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """flat strings -> (order_key, tok_id), both int64, vectorized."""
        if len(flat) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        pos = pc.index_in(flat, value_set=self.tokens_lex)
        if not self.hash_unknown:
            # exact mode has no unknown-token story: a null position would
            # become a garbage index after the NaN->int cast below. Unreachable
            # when the vocab was built from the probed corpus, but this is a
            # public reuse API — fail loudly instead (round-3 advice).
            n_unknown = pos.null_count
            if n_unknown:
                raise ValueError(
                    f"TokenOrder.probe: {n_unknown} token(s) not in the exact "
                    "vocabulary; build the order from the probed corpus or "
                    "use mg mode (hash_unknown) for open vocabularies"
                )
            p = pos.to_numpy(zero_copy_only=False).astype(np.int64)
            order = self.order_lex[p]
            ids = order if self.ids_lex is None else self.ids_lex[p]
            return order, ids
        known = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        p = pos.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = _hash62(flat)
        order = ids.copy()
        if known.any():
            order[known] = self.order_lex[p[known]]
            # identity stays the hash for EVERY token (one consistent id
            # space for verification intersections)
        return order, ids


def exact_token_order(sets_ds, grams_col: str = "grams") -> TokenOrder | None:
    """Exact rarest-first ranks from a shuffle-free df pre-pass (per-block
    partial counts, one driver merge). Returns None on an empty corpus."""

    def df_partial(b: pa.Table) -> pa.Table:
        g = b[grams_col].combine_chunks()
        vals = g.flatten()  # grams are distinct within a doc
        if len(vals) == 0:
            return pa.schema([("tok", pa.string()), ("n", pa.int64())]).empty_table()
        t = pa.table({"tok": vals}).group_by("tok").aggregate([("tok", "count")])
        return t.rename_columns(["tok", "n"])

    parts = [
        t
        for t in ray.get(
            sets_ds.map_batches(df_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "tok" in t.column_names
    ]
    if not parts:
        return None
    merged = pa.concat_tables(parts).group_by("tok").aggregate([("n", "sum")])
    toks = merged["tok"].combine_chunks()
    ns = merged["n_sum"].combine_chunks()
    # rarest-first rank: order by (count, token); then re-index lex-sorted
    rank_order = pc.sort_indices(
        merged, sort_keys=[("n_sum", "ascending"), ("tok", "ascending")]
    ).to_numpy()
    rank = np.empty(len(toks), dtype=np.int64)
    rank[rank_order] = np.arange(len(toks))
    lex = pc.sort_indices(toks).to_numpy().astype(np.int64)
    return TokenOrder(
        tokens_lex=toks.take(pa.array(lex)),
        order_lex=rank[lex],
        ids_lex=None,
        hash_unknown=False,
        vocab_n=len(toks) + 1,
    )


def _mg_compress(u: np.ndarray, c: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries reduction of an exact/summary count table to <= k
    entries: subtract the (k+1)-th largest count from all, keep positives.
    Fully vectorized."""
    if len(u) <= k:
        return u, c
    thr = np.partition(c, len(c) - k - 1)[len(c) - k - 1]
    c2 = c - thr
    keep = c2 > 0
    return u[keep], c2[keep]


def mg_token_order(sets_ds, k: int = 4096, grams_col: str = "grams") -> TokenOrder | None:
    """Distributed Misra-Gries frequent-token order (the unbounded-vocab
    fallback). Driver state: <= k·blocks summary entries transiently,
    <= k tokens finally — never the vocabulary."""

    def mg_partial(b: pa.Table) -> pa.Table:
        g = b[grams_col].combine_chunks()
        vals = g.flatten()
        if len(vals) == 0:
            return pa.schema([("tok", pa.string()), ("n", pa.int64())]).empty_table()
        vc = pa.table({"tok": vals}).group_by("tok").aggregate([("tok", "count")])
        u = np.asarray(vc["tok"].to_pylist(), dtype=object)
        c = vc["tok_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = _mg_compress(u, c, k)
        return pa.table({"tok": pa.array(list(u), type=pa.string()),
                         "n": pa.array(c, type=pa.int64())})

    parts = [
        t
        for t in ray.get(
            sets_ds.map_batches(mg_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "tok" in t.column_names
    ]
    if not parts:
        return None
    merged = pa.concat_tables(parts).group_by("tok").aggregate([("n", "sum")])
    u = np.asarray(merged["tok"].to_pylist(), dtype=object)
    c = merged["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    u, c = _mg_compress(u, c, k)
    if len(u) == 0:
        # no frequent tokens survive: pure-hash order
        return TokenOrder(
            tokens_lex=pa.array([], type=pa.string()),
            order_lex=np.empty(0, dtype=np.int64),
            ids_lex=np.empty(0, dtype=np.int64),
            hash_unknown=True,
            vocab_n=None,
        )
    # frequent tokens ordered by (estimated count asc, token asc), placed
    # AFTER every hash id via the 2^62 base
    rank_order = np.lexsort((u, c))
    rank = np.empty(len(u), dtype=np.int64)
    rank[rank_order] = np.arange(len(u))
    lex = np.argsort(u)
    toks_lex = pa.array(list(u[lex]), type=pa.string())
    return TokenOrder(
        tokens_lex=toks_lex,
        order_lex=_FREQ_BASE + rank[lex],
        ids_lex=None,  # identity = hash for all tokens (hash_unknown mode)
        hash_unknown=True,
        vocab_n=None,
    )
