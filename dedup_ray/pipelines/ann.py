"""Similarity search over the ``embeddings`` table.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul and emits its LOCAL top-k;
a tiny driver-side merge finishes. The scale path swaps the final merge for
``sort + limit`` per query and the candidate stage for LSH buckets
(random-hyperplane signs), both included.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _emb(sf_dir: str) -> rd.Dataset:
    from dedup_ray.sources.io import read_view

    return read_view(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _mat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, flat.reshape(len(ids), -1).astype(np.float64)


class _TopKScorer:
    """Actor: holds the normalized broadcast query matrix; per batch emits
    each query's local top-k over the batch's vectors."""

    def __init__(self, queries_ref: ray.ObjectRef, k: int) -> None:
        self.qids, q = ray.get(queries_ref)
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _mat(batch)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = self.q @ m.T  # (n_queries, batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k + 1, sims.shape[1])  # +1: self-match removed later
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.extend([int(self.qids[qi])] * len(idx))
            out_n.extend(int(ids[i]) for i in idx)
            out_s.extend(float(sims[qi, i]) for i in idx)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def _collect_queries(emb: rd.Dataset, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Filter vec_id < n_queries DISTRIBUTED, collect only the tiny query
    set on the driver (never the full embedding table)."""
    q = emb.map_batches(
        lambda b: b.filter(pa.compute.less(b["vec_id"], n_queries)),
        batch_format="pyarrow",
    )
    tabs = [t for t in ray.get(q.to_arrow_refs())
            if t.num_rows and "vec_id" in t.column_names]
    return _mat(pa.concat_tables(tabs))


def ann_topk(sf_dir: str, k: int = 5, n_queries: int = 5) -> pd.DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors (excluding
    self): (query_id, neighbor_id, rank). Rank ties broken by neighbor_id —
    deterministic and float-free output."""
    emb = _emb(sf_dir)
    ref = ray.put(_collect_queries(emb, n_queries))

    local = emb.map_batches(
        _TopKScorer,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    ).to_pandas()
    local = local[local.query_id != local.neighbor_id]
    local = local.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = local.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True).astype("int64")


def cosine_neardup_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) with cosine >= threshold.

    Blocked matmul: the full normalized matrix is broadcast once; each batch
    compares its rows against the whole matrix (at 10^12 scale the broadcast
    side becomes the LSH-bucketed candidate set below instead).
    Output (a, b) only — float-free for the hash compare."""
    emb = _emb(sf_dir)
    tbl = pa.concat_tables([t for t in ray.get(emb.to_arrow_refs()) if t.num_rows])
    ids_all, m_all = _mat(tbl)
    m_all = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, m_all))

    def block(batch: pa.Table) -> pa.Table:
        aid, am = _mat(batch)
        am = am / np.linalg.norm(am, axis=1, keepdims=True)
        bid, bm = ray.get(ref)
        sims = am @ bm.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = aid[ai] < bid[bi]
        return pa.table(
            {
                "a": pa.array(aid[ai][keep], type=pa.int64()),
                "b": pa.array(bid[bi][keep], type=pa.int64()),
            }
        )

    out = emb.map_batches(block, batch_format="pyarrow", batch_size=2048).to_pandas()
    if "a" not in out.columns:  # all blocks empty -> schema dropped
        return pd.DataFrame(columns=["a", "b"]).astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")


def _train_centroids(
    emb: rd.Dataset, n_cells: int, seed: int, max_train: int = 4096
) -> np.ndarray:
    """Spherical k-means codebook trained on a BOUNDED deterministic sample
    (stride on vec_id): the driver never materializes the full table, only
    <= ~max_train rows. Shared by the IVF probe and SemDeDup cells."""
    n_total = emb.count()  # parquet metadata count, no scan
    stride = max(1, n_total // max_train)
    samp = emb.map_batches(
        lambda b: b.filter(
            pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % stride == 0)
        ),
        batch_format="pyarrow",
    )
    tabs = [t for t in ray.get(samp.to_arrow_refs())
            if t.num_rows and "vec_id" in t.column_names]
    # block arrival order is NOT deterministic across runs; sort the (small)
    # sample by vec_id so the seeded init — and thus every downstream cell
    # assignment — is bit-reproducible
    _, train = _mat(pa.concat_tables(tabs).sort_by("vec_id"))
    train = train / np.linalg.norm(train, axis=1, keepdims=True)

    rng = np.random.default_rng(seed)
    cent = train[rng.choice(len(train), size=min(n_cells, len(train)), replace=False)]
    for _ in range(15):
        assign = (train @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            members = train[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    return cent


def semdedup_embeddings(
    sf_dir: str, tau: float = 0.4, n_cells: int = 16, seed: int = 42
) -> rd.Dataset:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    partition vectors into k-means cells, then within each cell drop any
    vector that has a cosine-similar (>= tau) neighbor with a smaller
    vec_id — the keeper of a near-dup set is its min id, matching the
    exact-dedup keeper rule. Approximate by design: only within-cell pairs
    are compared (cross-cell near-dups survive), which is what makes it
    O(sum cell^2) instead of O(n^2).

    Scale shape: centroids train on a bounded sample and broadcast via
    ray.put; assignment is one streamed map_batches; the in-cell pass is
    ONE coarse shuffle on cell id via grouped_runs with a per-cell matmul.
    At 100 TB, grow n_cells with n so cells stay worker-heap-sized (the
    paper uses ~sqrt(n) cells for the same reason).
    Returns every vector as (vec_id, cell, kept)."""
    emb = _emb(sf_dir)
    cent_ref = ray.put(_train_centroids(emb, n_cells, seed))

    def assign(b: pa.Table) -> pa.Table:
        ids, m = _mat(b)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = (m @ ray.get(cent_ref).T).argmax(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(cells, type=pa.int64()),
                "embedding": b["embedding"],
            }
        )

    assigned = emb.map_batches(assign, batch_format="pyarrow")

    def dedup_cell(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import run_starts

        ids, m = _mat(g)  # sorted by (cell, vec_id) by grouped_runs
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = g["cell"].to_numpy(zero_copy_only=False)
        kept = np.ones(len(ids), dtype=bool)
        bounds = np.concatenate([run_starts(cells), [len(cells)]])
        for r in range(len(bounds) - 1):
            lo, hi = bounds[r], bounds[r + 1]
            sims = m[lo:hi] @ m[lo:hi].T
            # drop i if any j < i (smaller vec_id; rows are id-sorted)
            # has sims >= tau: strict upper triangle, any over columns
            hit = np.triu(sims >= tau, k=1).any(axis=0)
            kept[lo:hi] = ~hit
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(cells, type=pa.int64()),
                "kept": pa.array(kept),
            }
        )

    from dedup_ray.stages.grouped import grouped_runs

    return grouped_runs(assigned, "cell", dedup_cell, sort_cols=["cell", "vec_id"])


def ann_ivf_topk(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path for ann_topk.

    Driver trains a tiny k-means codebook on a sample; centroids broadcast;
    each batch assigns its vectors to cells and emits scores ONLY for
    queries whose ``n_probe`` nearest cells include that vector's cell.
    Returns (query_id, neighbor_id, rank) like ann_topk (approximate:
    recall measured vs the exact baseline in tests).
    """
    emb = _emb(sf_dir)
    cent = _train_centroids(emb, n_cells, seed)
    qids, q = _collect_queries(emb, n_queries)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_cells = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    ref = ray.put((qids, q, cent, q_cells))

    def block(batch: pa.Table) -> pa.Table:
        # per-batch LOCAL top-k (the _TopKScorer shape the exact path uses):
        # each batch ships at most n_queries*k rows to the driver instead of
        # every probed candidate (round-2 review item #4 — the per-candidate
        # Python appends + full-candidate to_pandas were ~corpus/n_cells *
        # n_probe * n_queries rows of driver traffic at scale). The local
        # cut uses the SAME total order as the global one (sim desc,
        # neighbor_id asc), so the global top-k is contained in the union of
        # local top-ks — output identical, ties included.
        bids, bm = _mat(batch)
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        qi, qm, cc, qcells = ray.get(ref)
        cells = (bm @ cc.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for row in range(qm.shape[0]):  # n_queries is tiny (a search request)
            probe = np.isin(cells, qcells[row]) & (bids != qi[row])
            if not probe.any():
                continue
            sims = qm[row] @ bm[probe].T
            cand_ids = bids[probe]
            order = np.lexsort((cand_ids, -sims))[:k]
            out_q.append(np.full(order.size, qi[row], dtype=np.int64))
            out_n.append(cand_ids[order])
            out_s.append(sims[order])
        if not out_q:
            return pa.schema(
                [("query_id", pa.int64()), ("neighbor_id", pa.int64()),
                 ("sim", pa.float64())]
            ).empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(
                    np.concatenate(out_n).astype(np.int64), type=pa.int64()
                ),
                "sim": pa.array(
                    np.concatenate(out_s).astype(np.float64), type=pa.float64()
                ),
            }
        )

    # bounded driver merge: n_queries * k rows per block
    local = emb.map_batches(block, batch_format="pyarrow", batch_size=4096).to_pandas()
    local = local.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    top = local.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True).astype("int64")


def _bucket_keys(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Hyperplane-sign bucket key per row. Sequential accumulation over dims
    (not matmul): the fold order is part of the operator's definition so the
    DuckDB oracle's list_sum (a strict left fold) reproduces the signs
    bit-identically."""
    n_planes = planes.shape[1]
    acc = np.zeros((m.shape[0], n_planes), dtype=np.float64)
    for j in range(m.shape[1]):
        acc += m[:, j : j + 1] * planes[j]
    bits = acc > 0
    return (bits.astype(np.int64) * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)


def lsh_buckets(sf_dir: str, n_planes: int = 12, seed: int = 42) -> rd.Dataset:
    """Random-hyperplane LSH bucket histogram: (bucket, n_vecs). The
    candidate generator of the scale ANN path — same-bucket vectors are the
    near-neighbor candidates; here we surface the bucket sizes (skew view)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((64, n_planes))
    ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, m = _mat(batch)
        bucket = _bucket_keys(m, ray.get(ref))
        t = pa.table({"bucket": pa.array(bucket, type=pa.int64()),
                      "vec_id": pa.array(ids, type=pa.int64())})
        return t.group_by("bucket").aggregate([("vec_id", "count")]).rename_columns(
            ["bucket", "pn"]
        )

    agg = _emb(sf_dir).map_batches(bucketize, batch_format="pyarrow").groupby("bucket").sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"bucket": b["bucket"], "n_vecs": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def embedding_neardup_lsh(
    sf_dir: str,
    threshold: float = 0.3,
    rows_per_band: int = 4,
    n_bands: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    """Scale-path embedding near-dup: banded hyperplane-LSH candidates ->
    exact cosine verify on same-bucket pairs only. Output (a, b), a < b.

    This is the 100-TB shape the cosine_neardup_pairs docstring promises,
    with the OR-amplification the single-signature lsh_buckets histogram
    lacks: each vector gets ``n_bands`` independent ``rows_per_band``-plane
    sign keys; a pair is a candidate iff it collides in ANY band
    (recall = 1-(1-p^r)^L per the angle-collision model, measured vs the
    brute baseline in tests; precision 1.0 — the verify is the same exact
    cosine threshold). Vectors are hash-partitioned by (band, key) with the
    embedding co-located, so pair generation AND verify run vectorized inside
    each shuffle partition; a pair verified in several bands is deduped by a
    second (verified-pairs-only, post-filter) shuffle. Nothing — not the
    matrix, not the pair set — is ever materialized on the driver before the
    final result."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((64, n_bands * rows_per_band))
    ref = ray.put(planes)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, m = _mat(batch)
        keys = _bucket_keys(m, ray.get(ref))  # n_bands*r sign bits, folded
        n = len(ids)
        # band b's key = bits [b*r, (b+1)*r) of the folded signature,
        # prefixed with the band id so bands never collide across buckets
        bkeys = np.empty((n, n_bands), dtype=np.int64)
        mask = (1 << rows_per_band) - 1
        for b in range(n_bands):
            bkeys[:, b] = (b << rows_per_band) | ((keys >> (b * rows_per_band)) & mask)
        idx = np.repeat(np.arange(n), n_bands)
        return batch.take(pa.array(idx)).append_column(
            "bkey", pa.array(bkeys.reshape(-1), type=pa.int64())
        )

    keyed = _emb(sf_dir).map_batches(explode_bands, batch_format="pyarrow")

    def verified_pairs_of_runs(g: pa.Table) -> pa.Table:
        ids, m = _mat(g)
        bkeys = g["bkey"].to_numpy(zero_copy_only=False)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        bounds = np.append(run_starts(bkeys), len(bkeys))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sub = m[s:e]
            sims = sub @ sub.T  # one matmul per bucket-run, no Python pairs
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
            if len(ai):
                out_a.append(ids[s:e][ai])
                out_b.append(ids[s:e][bi])
        if not out_a:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    pairs = grouped_runs(
        keyed, "bkey", verified_pairs_of_runs, sort_cols=["bkey", "vec_id"]
    )

    from dedup_ray.stages.grouped import drop_sorted_dup_pairs

    out = grouped_runs(
        pairs, "a", lambda g: drop_sorted_dup_pairs(g, "a", "b"),
        sort_cols=["a", "b"],
    ).to_pandas()
    if "a" not in out.columns:  # no collisions anywhere -> schema dropped
        return pd.DataFrame(columns=["a", "b"]).astype("int64")
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")


def _seqfold_norms(m: np.ndarray) -> np.ndarray:
    """L2 norms with a strict sequential fold across dimensions — the same
    addition order as DuckDB's list_sum, so per-row values are bit-identical
    to the SQL oracle (numpy's pairwise sum would differ in ulps)."""
    acc = np.zeros(len(m))
    for j in range(m.shape[1]):
        x = m[:, j]
        acc = acc + x * x
    return np.sqrt(acc)


def lang_embedding_norms(sf_dir: str) -> rd.Dataset:
    """Cross-table enrichment: per-language mean embedding L2 norm:
    (lang, n_vecs, mean_norm). The norm is pre-reduced ON THE EMBEDDINGS
    SCAN (each list<float> vector collapses to one float64 before any data
    moves — minimize-shuffle rule), then documents join the (vec_id, norm)
    table in one co-partitioning shuffle_join and a per-lang partial
    aggregate finishes. Only the cross-row mean needs rounding (sum order
    differs between engines); per-row norms are bit-identical to the oracle
    (see _seqfold_norms)."""
    import pyarrow.compute as pc

    from dedup_ray.sources.io import read_view
    from dedup_ray.stages.join import shuffle_join

    def to_norms(b: pa.Table) -> pa.Table:
        ids, m = _mat(b)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "norm": pa.array(_seqfold_norms(m), type=pa.float64()),
            }
        )

    norms = _emb(sf_dir).map_batches(to_norms, batch_format="pyarrow")
    docs = read_view(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    joined = shuffle_join(docs, norms, on="doc_id", right_on="vec_id")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("lang").aggregate(
            [("norm", "sum"), ("norm", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"lang": g["lang"], "pn": g["norm_count"], "ps": g["norm_sum"]}
        )

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby("lang").sum(
        ["pn", "ps"]
    )

    def final(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": b["lang"],
                "n_vecs": b["sum(pn)"].cast(pa.int64()),
                "mean_norm": pc.round(
                    pc.divide(b["sum(ps)"], b["sum(pn)"].cast(pa.float64())), 4
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def _train_pq_codebooks(
    emb: rd.Dataset, m_sub: int, n_codes: int, seed: int, max_train: int = 4096
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks, (m_sub, n_codes, dim/m_sub),
    trained on the same bounded deterministic stride-sample as IVF/SemDeDup
    (the driver never materializes the full table)."""
    n_total = emb.count()  # parquet metadata count, no scan
    stride = max(1, n_total // max_train)
    samp = emb.map_batches(
        lambda b: b.filter(
            pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % stride == 0)
        ),
        batch_format="pyarrow",
    )
    tabs = [t for t in ray.get(samp.to_arrow_refs())
            if t.num_rows and "vec_id" in t.column_names]
    _, train = _mat(pa.concat_tables(tabs).sort_by("vec_id"))
    dim = train.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub_d = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, n_codes, sub_d))
    for s in range(m_sub):
        x = train[:, s * sub_d : (s + 1) * sub_d]
        cent = x[rng.choice(len(x), size=min(n_codes, len(x)), replace=False)].copy()
        if len(cent) < n_codes:
            # tiny corpus: pad by repeating rows — duplicate centroids are
            # harmless (argmin picks the first), a shape mismatch is a crash
            cent = cent[np.arange(n_codes) % len(cent)].copy()
        for _ in range(15):
            # L2 argmin via the expanded form; x-norms are rank-constant
            d = -2 * x @ cent.T + (cent * cent).sum(axis=1)
            assign = d.argmin(axis=1)
            for c in range(cent.shape[0]):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def _pq_encode(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m_sub) uint8 codes: per-subspace L2 argmin."""
    m_sub, n_codes, sub_d = books.shape
    codes = np.empty((m.shape[0], m_sub), dtype=np.uint8)
    for s in range(m_sub):
        x = m[:, s * sub_d : (s + 1) * sub_d]
        cent = books[s]
        d = -2 * x @ cent.T + (cent * cent).sum(axis=1)
        codes[:, s] = d.argmin(axis=1)
    return codes


def ann_pq_topk(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    m_sub: int = 8,
    n_codes: int = 16,
    rerank: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    """Product-quantization ANN (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): L2 top-k via 8-byte codes + asymmetric
    distance (ADC) + exact re-rank of the top ``rerank*k`` shortlist:
    (query_id, neighbor_id, rank). Approximate — pytest measures recall vs
    the exact L2 baseline and proves shortlist==corpus degenerates to exact.

    Scale shape (the reason PQ is the 10^12-vector path): the standing index
    is ``m_sub`` BYTES per vector (8 B vs 256 B of float32 — the whole index
    of a 10^12-row corpus fits a few TB of object store, streamable through
    every node), codebooks train on the same bounded stride-sample as IVF,
    each query ships one (m_sub × n_codes) lookup table, and a batch's ADC
    score is a uint8 gather + row-sum — no float matrix ever moves. Only the
    tiny global shortlist (rerank·k·n_queries ids) is exact-scored, via a
    second scan filtered to shortlist ids."""
    emb = _emb(sf_dir)
    books = _train_pq_codebooks(emb, m_sub, n_codes, seed)
    qids, q = _collect_queries(emb, n_queries)
    m_s, n_c, sub_d = books.shape
    # per-query ADC lookup tables: lut[qi, s, c] = ||q_s - cent[s, c]||^2
    diff = q.reshape(len(qids), m_s, 1, sub_d) - books[None]
    luts = (diff * diff).sum(axis=3)  # (nq, m_sub, n_codes)
    ref = ray.put((qids, luts, books))
    shortlist = max(1, rerank * k) + 1  # +1: self-match removed later

    def block(batch: pa.Table) -> pa.Table:
        bids, bm = _mat(batch)
        qi, lt, bk = ray.get(ref)
        codes = _pq_encode(bm, bk)  # (n, m_sub) uint8
        out_q, out_n, out_d = [], [], []
        cols = np.arange(codes.shape[1])
        take = min(shortlist, len(bids))
        for row in range(len(qi)):
            # gather: lut[s, codes[:, s]] summed over s
            d = lt[row][cols, codes].sum(axis=1)
            idx = np.argpartition(d, take - 1)[:take]
            out_q.extend([int(qi[row])] * len(idx))
            out_n.extend(int(bids[i]) for i in idx)
            out_d.extend(float(d[i]) for i in idx)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "adc": pa.array(out_d, type=pa.float64()),
            }
        )

    local = emb.map_batches(block, batch_format="pyarrow", batch_size=4096).to_pandas()
    local = local[local.query_id != local.neighbor_id]
    local = local.sort_values(
        ["query_id", "adc", "neighbor_id"], ascending=[True, True, True]
    )
    short = local.groupby("query_id", as_index=False).head(shortlist)

    # exact re-rank: fetch TRUE vectors for shortlist ids only (tiny), via a
    # second scan filtered distributed-side — never the full table
    ids_needed = np.unique(short["neighbor_id"].to_numpy())
    need_ref = ray.put(ids_needed)

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = np.isin(b["vec_id"].to_numpy(zero_copy_only=False), wanted)
        return b.filter(pa.array(mask))

    tabs = [t for t in ray.get(emb.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows and "vec_id" in t.column_names]
    sids, sm = _mat(pa.concat_tables(tabs))
    pos = {int(v): i for i, v in enumerate(sids)}
    qpos = {int(v): i for i, v in enumerate(qids)}
    nvec = sm[[pos[int(v)] for v in short["neighbor_id"]]]
    qvec = q[[qpos[int(v)] for v in short["query_id"]]]
    short = short.copy()
    short["dist"] = ((nvec - qvec) ** 2).sum(axis=1)
    short = short.sort_values(
        ["query_id", "dist", "neighbor_id"], ascending=[True, True, True]
    )
    top = short.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True).astype("int64")


def extreme_norm_vectors(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Embedding sanity screening: the k vectors with the largest L2 norm
    — (vec_id, norm). Exploding norms flag broken encoders / unnormalized
    shards before they poison ANN indexes. Norms collapse to one float64
    per vector ON the scan (bit-identical left-fold, _seqfold_norms);
    selection is the local-topk-prune + k-row sort-limit shape — the full
    norm column never concentrates anywhere."""
    import pyarrow.compute as pc

    def to_norms(b: pa.Table) -> pa.Table:
        ids, m = _mat(b)
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()),
             "norm": pa.array(_seqfold_norms(m), type=pa.float64())}
        )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("norm", "descending"), ("vec_id", "ascending")]
        )
        return b.take(idx[:k])

    return (
        _emb(sf_dir).map_batches(to_norms, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["norm", "vec_id"], descending=[True, False])
        .limit(k)
    )


def embedding_dim_minmax(sf_dir: str) -> pa.Table:
    """Per-dimension embedding range profile — (dim, min_v, max_v): the
    sanity scan that catches dead dimensions, clipped activations and
    scale drift before they poison an index build. min/max are
    order-independent, so float compare is exact across engines (unlike
    means — no rounding dance needed). Each batch collapses its (n, d)
    matrix to ONE 64-row partial (a d-sized reduction, not a shuffle);
    the driver folds the tiny partials. Bounded result -> pa.Table."""

    def partial(b: pa.Table) -> pa.Table:
        _, m = _mat(b)
        if m.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "pmin": pa.array([], pa.float64()),
                             "pmax": pa.array([], pa.float64())})
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "pmin": pa.array(m.min(axis=0)),
                "pmax": pa.array(m.max(axis=0)),
            }
        )

    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    for t in ray.get(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows:
            for d, mn, mx in zip(t["dim"].to_pylist(), t["pmin"].to_pylist(),
                                 t["pmax"].to_pylist()):
                lo[d] = mn if d not in lo else min(lo[d], mn)
                hi[d] = mx if d not in hi else max(hi[d], mx)
    dims = sorted(lo)
    return pa.table(
        {
            "dim": pa.array(dims, pa.int64()),
            "min_v": pa.array([lo[d] for d in dims], pa.float64()),
            "max_v": pa.array([hi[d] for d in dims], pa.float64()),
        }
    )


def kmeans_global_train(
    sf_dir: str, k: int = 8, iters: int = 5
) -> pa.Table:
    """DISTRIBUTED Lloyd k-means over the full embedding table — the
    iterative-algorithm capability done Ray-Data-style, complementing the
    driver-sample training used by IVF/SemDeDup (ann.py:135-177): every
    iteration is one streaming pass where each batch computes nearest
    centroids (one matmul) and collapses to a (k, d) partial-sum + count
    block; the driver folds k×d floats per batch — never rows. Centroids
    are broadcast per iteration via ray.put. Deterministic: seeded
    stride-sample init and a block-index-ordered fold (to_arrow_refs
    preserves block order), so two runs produce identical centroids.
    Returns (cluster_id, n_vecs, inertia) — inertia is the mean squared
    distance of members, the convergence metric (monotone non-increasing
    across iterations; tests/test_ann.py asserts it). Rows-only: float
    partial sums are order-sensitive, so no SQL oracle — determinism and
    monotonicity are the checked contract."""
    emb = _emb(sf_dir).materialize()  # consumed once per iteration

    # seeded deterministic init: first k vectors of the first block
    first = ray.get(emb.to_arrow_refs()[0])
    _, m0 = _mat(first)
    cents = m0[:k].copy()
    if cents.shape[0] < k:  # degenerate tiny input: pad by repetition
        reps = int(np.ceil(k / max(cents.shape[0], 1)))
        cents = np.tile(cents, (reps, 1))[:k] if cents.size else np.zeros(
            (k, first.num_columns), dtype=np.float64
        )

    def make_pass(cref: "ray.ObjectRef"):
        def assign(b: pa.Table) -> pa.Table:
            c = _PASS_CACHE.get(cref.binary())
            if c is None:
                c = ray.get(cref)
                _PASS_CACHE.clear()
                _PASS_CACHE[cref.binary()] = c
            _, m = _mat(b)
            if m.size == 0:
                return pa.table(
                    {"cluster_id": pa.array([], pa.int64()),
                     "pn": pa.array([], pa.int64()),
                     "pin": pa.array([], pa.float64()),
                     "psum": pa.array([], pa.list_(pa.float64()))}
                )
            # nearest centroid: ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * m @ c.T
                + (c * c).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            dmin = d2[np.arange(len(a)), a]
            sums = np.zeros((c.shape[0], m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            inert = np.bincount(
                a, weights=np.maximum(dmin, 0.0), minlength=c.shape[0]
            )
            return pa.table(
                {"cluster_id": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                 "pn": pa.array(cnt),
                 "pin": pa.array(inert),
                 "psum": pa.array(list(sums))}
            )

        return assign

    for it in range(iters):
        cref = ray.put(cents)
        parts = ray.get(
            emb.map_batches(make_pass(cref), batch_format="pyarrow")
            .to_arrow_refs()
        )
        sums = np.zeros_like(cents)
        cnt = np.zeros(cents.shape[0], dtype=np.int64)
        inert = np.zeros(cents.shape[0], dtype=np.float64)
        for t in parts:  # block order: deterministic fold
            if t.num_rows == 0:
                continue
            ks = t["cluster_id"].to_numpy(zero_copy_only=False)
            cnt[ks] += t["pn"].to_numpy(zero_copy_only=False)
            inert[ks] += t["pin"].to_numpy(zero_copy_only=False)
            ps = t["psum"].combine_chunks()
            flat = ps.flatten().to_numpy(zero_copy_only=False)
            sums[ks] += flat.reshape(len(ks), -1)
        nz = cnt > 0
        new = cents.copy()
        new[nz] = sums[nz] / cnt[nz][:, None]
        cents = new
    mean_in = np.where(cnt > 0, inert / np.maximum(cnt, 1), 0.0)
    return pa.table(
        {"cluster_id": pa.array(np.arange(cents.shape[0], dtype=np.int64)),
         "n_vecs": pa.array(cnt),
         "inertia": pa.array(mean_in)}
    )


_PASS_CACHE: dict[bytes, np.ndarray] = {}


def embedding_pca(sf_dir: str, k: int = 8) -> pa.Table:
    """Distributed PCA over the embedding table — (component,
    explained_var_ratio, cum_ratio): the dimensionality profile that
    decides how many components a projection / IVF / visualization
    actually needs. One streaming pass accumulates the d-vector sum and
    d x d outer-product sum per batch (a (d²+d)-float partial, never
    rows); the driver folds block-ordered partials, forms the covariance
    once, and eigendecomposes the tiny d x d matrix. Float accumulation
    order is batch-boundary-specific, so repeat runs agree to 1e-12,
    not bitwise. Rows-only: float
    accumulation order is engine-specific, so the contract is the pytest
    one — eigenvalues match a single-process numpy reference to 1e-8,
    ratios are descending and sum to <= 1."""
    parts_schema = pa.schema(
        [("pn", pa.int64()), ("psum", pa.list_(pa.float64())),
         ("pouter", pa.list_(pa.float64()))]
    )

    def partial(b: pa.Table) -> pa.Table:
        _, m = _mat(b)
        if m.size == 0:
            return parts_schema.empty_table()
        return pa.table(
            {
                "pn": pa.array([m.shape[0]], pa.int64()),
                "psum": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "pouter": pa.array(
                    [(m.T @ m).reshape(-1)], pa.list_(pa.float64())
                ),
            }
        )

    n = 0
    s = None
    o = None
    for t in ray.get(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows == 0 or "pn" not in t.column_names:
            continue
        for i in range(t.num_rows):
            n += int(t["pn"][i].as_py())
            ps = np.asarray(t["psum"][i].as_py(), dtype=np.float64)
            po = np.asarray(t["pouter"][i].as_py(), dtype=np.float64)
            s = ps if s is None else s + ps
            o = po if o is None else o + po
    if n == 0:
        return pa.schema(
            [("component", pa.int64()), ("explained_var_ratio", pa.float64()),
             ("cum_ratio", pa.float64())]
        ).empty_table()
    d = s.shape[0]
    mean = s / n
    cov = o.reshape(d, d) / n - np.outer(mean, mean)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    evals = np.maximum(evals, 0.0)
    tot = evals.sum()
    ratio = evals[:k] / tot if tot > 0 else np.zeros(min(k, d))
    return pa.table(
        {
            "component": pa.array(np.arange(len(ratio), dtype=np.int64)),
            "explained_var_ratio": pa.array(ratio),
            "cum_ratio": pa.array(np.cumsum(ratio)),
        }
    )


def knn_graph(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """k-nearest-neighbor graph over the embedding table — for every
    vector its top-k cosine neighbors (self excluded): (src, dst, rk),
    rk 1-based by (similarity desc, dst asc). The kNN graph is the
    substrate for SemDeDup-style pruning, graph-based ANN indexes
    (HNSW/NSG construction), and label propagation.

    Baseline shape shared with cosine_neardup_pairs: the full normalized
    matrix is broadcast ONCE (ray.put), each batch does one matmul
    against it and ranks row-wise. The broadcast side is sorted by
    vec_id so a STABLE argsort of -sims breaks exact similarity ties by
    ascending dst — the oracle's ORDER BY sim DESC, dst tiebreak —
    without shipping floats to the compare (output is int-only). At
    10^12 rows the broadcast matrix swaps for IVF cell candidates
    (ann_ivf_topk's probe) or LSH buckets, same ranking kernel; ranking
    is O(n log n) per row here, O(cell) there."""
    emb = _emb(sf_dir)
    tbl = pa.concat_tables(
        [t for t in ray.get(emb.to_arrow_refs())
         if t.num_rows and "vec_id" in t.column_names]
    )
    ids_all, m_all = _mat(tbl.sort_by("vec_id"))
    m_all = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, m_all))

    def block(batch: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("rk", pa.int64())]
        )
        if batch.num_rows == 0 or "vec_id" not in batch.column_names:
            return schema.empty_table()
        aid, am = _mat(batch)
        am = am / np.linalg.norm(am, axis=1, keepdims=True)
        bid, bm = ray.get(ref)
        kk = min(k, len(bid) - 1)
        if kk <= 0:
            return schema.empty_table()
        sims = am @ bm.T
        sims[aid[:, None] == bid[None, :]] = -np.inf  # no self-edges
        # stable sort of -sims: ties fall back to column order == vec_id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        return pa.table(
            {
                "src": pa.array(np.repeat(aid, kk), pa.int64()),
                "dst": pa.array(bid[order.ravel()], pa.int64()),
                "rk": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), len(aid)),
                    pa.int64(),
                ),
            }
        )

    out = emb.map_batches(block, batch_format="pyarrow", batch_size=2048).to_pandas()
    if "src" not in out.columns:
        return pd.DataFrame(columns=["src", "dst", "rk"]).astype("int64")
    return out.sort_values(["src", "rk"]).reset_index(drop=True).astype("int64")
