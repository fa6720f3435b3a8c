"""Document-table dedup operators (the reference's file-dedup semantics
mapped onto the driver's ``documents`` table: text ≙ file content, n_chars ≙
size — SURVEY.md §7.0).

Every SQL-expressible operator here has a matching ``oracle_sql`` entry in
``__ray_entry__.py``; output column names are shared verbatim with the SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import (
    MinHasher,
    band_keys,
    char_shingle_hashes,
    hamming64,
    simhash64,
    token_hashes,
)
from dedup_ray.functions.unionfind import connected_components


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from dedup_ray.sources.io import read_view

    return read_view(f"{sf_dir}/documents.parquet", columns=columns)


def _add_text_hash(batch: pa.Table) -> pa.Table:
    h = [
        hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("text_hash", pa.array(h, type=pa.string()))


# ------------------------------------------------------------- exact tier


def exact_dedup_groups(sf_dir: str) -> pa.Table:
    """Duplicate groups by exact text (~ group_by_full_hash,
    /root/reference/src/hasher.rs:83-85): (rep_id, n_dups), HAVING n>=2.

    Returns a pyarrow Table (dup GROUPS are a small result even at scale —
    the per-row work stays distributed) so an all-singleton corpus still
    yields a schema-stable empty result (Ray drops the schema of a dataset
    made solely of empty blocks)."""
    schema = pa.schema([("rep_id", pa.int64()), ("n_dups", pa.int64())])
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _add_text_hash, batch_format="pyarrow"
    )

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def emit_runs(g: pa.Table) -> pa.Table:
        # one vectorized pass over a bucket of complete text_hash groups
        keys = np.asarray(g["text_hash"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return schema.empty_table()
        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        sizes = np.diff(bounds)
        dup = sizes >= 2
        # sorted by (text_hash, doc_id) → run start IS the min doc_id
        return pa.table(
            {
                "rep_id": pa.array(ids[starts[dup]], type=pa.int64()),
                "n_dups": pa.array(sizes[dup], type=pa.int64()),
            }
        )

    out = grouped_runs(
        ds.select_columns(["doc_id", "text_hash"]), "text_hash", emit_runs,
        sort_cols=["text_hash", "doc_id"],
    )
    import ray

    tables = [t for t in ray.get(out.to_arrow_refs())
              if t.num_rows and "rep_id" in t.column_names]
    return pa.concat_tables(tables) if tables else schema.empty_table()


def dedup_keep_first(sf_dir: str) -> rd.Dataset:
    """Canonical dedup sink: one surviving doc_id (min) per distinct text —
    the keeper rule (/root/reference/src/actions.rs:21-26)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _add_text_hash, batch_format="pyarrow"
    )

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def keep_runs(g: pa.Table) -> pa.Table:
        keys = np.asarray(g["text_hash"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        starts = run_starts(keys)  # sorted by (hash, doc_id) → start = min
        return pa.table({"doc_id": pa.array(ids[starts], type=pa.int64())})

    return grouped_runs(
        ds.select_columns(["doc_id", "text_hash"]), "text_hash", keep_runs,
        sort_cols=["text_hash", "doc_id"],
    )


def size_groups(sf_dir: str) -> rd.Dataset:
    """~ group_by_size HAVING count>=2 (/root/reference/src/grouping.rs:13-24):
    (n_chars, n_rows). Pre-aggregated per batch before the shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.group_by("n_chars").aggregate([("doc_id", "count")])
        return df.rename_columns(["n_chars", "partial_n"])

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("n_chars").sum("partial_n")

    def having(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["sum(partial_n)"], 2))
        return pa.table(
            {
                "n_chars": b["n_chars"],
                "n_rows": b["sum(partial_n)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(having, batch_format="pyarrow")


def cascade_stats(sf_dir: str) -> rd.Dataset:
    """The three-stage cascade shape as data: per stage, how many candidate
    groups and rows survive (size -> 32-char-prefix -> full text), mirroring
    the reference's candidate-pruning funnel (/root/reference/src/main.rs:
    188-205). Output: (stage, n_groups, n_rows)."""
    rows = []
    docs = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def key_counts(key_fn, name: str) -> tuple[str, int, int]:
        def add_key(b: pa.Table) -> pa.Table:
            return pa.table({"k": key_fn(b), "doc_id": b["doc_id"]})

        keyed = docs.map_batches(add_key, batch_format="pyarrow")
        counts = keyed.groupby("k").count()
        surv_schema = pa.schema([("k", pa.string()), ("count()", pa.int64())])

        def having(b: pa.Table) -> pa.Table:
            # guard schema-dropped empty blocks (same latent pattern as the
            # round-1 flagship crash in stages/keys.py)
            if b.num_rows == 0 or "count()" not in b.column_names:
                return surv_schema.empty_table()
            return b.filter(pc.greater_equal(b["count()"], 2))

        surv = counts.map_batches(having, batch_format="pyarrow")
        pdf = surv.to_pandas()
        return (name, len(pdf), int(pdf["count()"].sum()) if len(pdf) else 0)

    rows.append(key_counts(lambda b: b["n_chars"].cast(pa.string()), "size"))
    rows.append(
        key_counts(
            lambda b: pc.utf8_slice_codeunits(b["text"], 0, 32), "prefix32"
        )
    )
    rows.append(
        key_counts(
            lambda b: pa.array(
                [hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
                 for t in b["text"].to_pylist()],
                type=pa.string(),
            ),
            "full",
        )
    )
    return rd.from_arrow(
        pa.table(
            {
                "stage": pa.array([r[0] for r in rows], type=pa.string()),
                "n_groups": pa.array([r[1] for r in rows], type=pa.int64()),
                "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


# ---------------------------------------------------------- near-dup tier


class _DocSigner:
    """Actor: text -> minhash sig + simhash (state built once per actor)."""

    def __init__(self, cfg: DedupConfig) -> None:
        self.cfg = cfg
        self.mh = MinHasher(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch["text"].to_pylist()
        n = len(texts)
        sigs = np.empty((n, cfg.num_perm), dtype=np.uint64)
        sims = np.empty(n, dtype=np.int64)
        has = np.zeros(n, dtype=bool)
        for i, t in enumerate(texts):
            sh = char_shingle_hashes(t or "", cfg.shingle_k)
            sigs[i] = self.mh.signature(sh)
            has[i] = sh.size > 0
            sims[i] = simhash64(token_hashes(t or ""))
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64), type=pa.int64()), cfg.num_perm
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash_sig": sig_col,
                "simhash": pa.array(sims, type=pa.int64()),
                "has_sig": pa.array(has),
            }
        )


_DOC_SIGNER_CACHE: dict[str, _DocSigner] = {}


def doc_signatures(sf_dir: str, cfg: DedupConfig | None = None) -> rd.Dataset:
    cfg = cfg or DedupConfig()

    def sign(b: pa.Table) -> pa.Table:
        s = _DOC_SIGNER_CACHE.get(cfg.config_hash())
        if s is None:
            s = _DocSigner(cfg)
            _DOC_SIGNER_CACHE[cfg.config_hash()] = s
        return s(b)

    # stateless tasks + per-process state cache (cheap state; elastic beats
    # actor-pool ramp-up — same rationale as stages/signatures.sign_batch)
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sign, batch_format="pyarrow", batch_size=1024
    )


def _doc_candidate_pairs(
    buckets: rd.Dataset,
    key_col: str,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Document-path bucket rows -> (src_id, dst_id) candidate pairs via the
    SHARED skew-safe pair kernel (stages/pairgen.py — one copy with the
    flagship, round-2 review: this path previously re-implemented an
    uncapped per-run Python loop that was O(n^2) on a hot band bucket).

    strict=True: over-cap buckets are split by EXACT rendezvous salting
    (pair-set-preserving), never degraded to star+chain — required because
    the document queries are oracle-checked pair/cluster LISTINGS (the
    deduped pair set must be byte-identical to the brute-force one; the
    extra duplicates salting emits are absorbed by the same idempotent
    verify + distributed pair-dedup that already handles cross-band
    duplicates)."""
    from dedup_ray.stages.pairgen import salted_candidate_pairs

    cfg = cfg or DedupConfig()
    return salted_candidate_pairs(
        buckets,
        key_col,
        id_col,
        cap=cfg.bucket_pair_cap,
        slack=cfg.salt_slack,
        strict=True,
        distributed_counts=cfg.distributed_prepass,
        counter_prefix="docs_lsh",
    )


def _band_buckets(sigs: rd.Dataset, cfg: DedupConfig) -> rd.Dataset:
    """Signatures -> exploded (combo, doc_id) band-bucket rows, where combo
    packs (band_key << 6) ^ band_id into one int64 shuffle key."""

    def explode(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        has = b["has_sig"].to_numpy(zero_copy_only=False)
        s = sigs_from_arrow(b["minhash_sig"])[has]
        ids = b["doc_id"].to_numpy(zero_copy_only=False)[has]
        bk = band_keys(s, cfg.bands, cfg.rows_per_band)
        m = s.shape[0]
        return pa.table(
            {
                "band_id": pa.array(
                    np.repeat(np.arange(cfg.bands, dtype=np.int32)[None, :], m, 0).ravel()
                ),
                "band_key": pa.array(bk.view(np.int64).ravel(), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, cfg.bands), type=pa.int64()),
            }
        )

    def add_combo(b: pa.Table) -> pa.Table:
        combo = (
            b["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
            << np.uint64(6)
        ) ^ b["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"combo": pa.array(combo.view(np.int64)), "doc_id": b["doc_id"]}
        )

    return sigs.map_batches(explode, batch_format="pyarrow").map_batches(
        add_combo, batch_format="pyarrow"
    )


def _minhash_band_candidates(
    sf_dir: str, cfg: DedupConfig, sigs: rd.Dataset | None = None
) -> tuple[rd.Dataset, rd.Dataset]:
    """Shared MinHash-LSH candidate generator: shingle -> minhash -> band
    bucket groupby -> (a < b) candidate pairs. Returns (sigs, cand); cand
    may contain cross-band duplicate pairs — verification is idempotent,
    so callers either tolerate repeats (union-find) or dedup pairs
    distributed (drop_sorted_dup_pairs). ``sigs``: a pre-materialized
    doc_signatures dataset to share across tiers (doc_neardup_clusters
    signs the corpus ONCE for its MinHash and SimHash tiers)."""
    if sigs is None:
        sigs = doc_signatures(sf_dir, cfg).materialize()
    buckets = _band_buckets(sigs, cfg)

    # candidate pairs stay a Dataset; cross-band duplicate pairs are NOT
    # deduped (a shuffle saved) — verification is idempotent and union-find
    # ignores repeated edges, mirroring the flagship trade (stages/lsh.py)
    cand = _doc_candidate_pairs(buckets, "combo", cfg)
    return sigs, cand


def _minhash_edge_table(
    sf_dir: str, cfg: DedupConfig, sigs: rd.Dataset | None = None
) -> pa.Table | None:
    """Confirmed MinHash est-Jaccard edges (a, b) as one small driver-side
    table (None when the corpus is all-distinct). Everything upstream is
    distributed; only the dup-bounded edge set is collected."""
    sigs, cand = _minhash_band_candidates(sf_dir, cfg, sigs)

    from dedup_ray.stages.join import attach_pair_attrs

    # distributed verify: attach each endpoint's signature to the pair rows
    # (broadcast lookup at this scale, hash-join at cluster scale) and apply
    # vectorized est-Jaccard per batch. Only confirmed EDGES (tiny) ever
    # reach the driver — never the signature table.
    attrs = sigs.map_batches(
        lambda b: pa.table(
            {"image_id": b["doc_id"], "minhash_sig": b["minhash_sig"]}
        ),
        batch_format="pyarrow",
    )

    def vfy(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        if b.num_rows == 0 or "src_minhash_sig" not in b.column_names:
            return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        sa = sigs_from_arrow(b["src_minhash_sig"])
        sb = sigs_from_arrow(b["dst_minhash_sig"])
        keep = (sa == sb).mean(axis=1) >= cfg.jaccard_threshold
        return pa.table(
            {
                "a": b["src_id"].filter(pa.array(keep)),
                "b": b["dst_id"].filter(pa.array(keep)),
            }
        )

    import ray

    # verify fused into the attach task (post_fn): per-pair signature
    # columns (~1 KB/side) reduce to the confirmed edge rows inside the
    # task instead of crossing the object store (see stages/join.py)
    edges_ds = attach_pair_attrs(cand, attrs, ["minhash_sig"], post_fn=vfy)
    edge_tables = [
        t for t in ray.get(edges_ds.to_arrow_refs())
        if t.num_rows and "a" in t.column_names
    ]
    return pa.concat_tables(edge_tables) if edge_tables else None


def minhash_neardup_clusters(sf_dir: str, cfg: DedupConfig | None = None) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering over documents: shingle -> minhash ->
    band bucket groupby -> est-Jaccard verify -> union-find. Returns
    (doc_id, cluster_id) — empty on an all-distinct corpus."""
    cfg = cfg or DedupConfig()
    et = _minhash_edge_table(sf_dir, cfg)
    if et is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster_id": pd.Series(dtype="int64")})
    edges = [(f"{a:012d}", f"{b:012d}") for a, b in
             zip(et["a"].to_pylist(), et["b"].to_pylist())]
    comp = connected_components(edges)
    out = sorted((int(k), int(v)) for k, v in comp.items())
    return pd.DataFrame(
        {"doc_id": [a for a, _ in out], "cluster_id": [b for _, b in out]}
    ).astype("int64")


def _vocab_order_ref(sets_ds, vocab_rank: str):
    """Build + broadcast the prefix-filter token order (functions/vocab.py):
    'exact' = exact rarest-first df ranks (driver state bounded by the
    vocabulary); 'mg' = distributed Misra-Gries top-k summary + content-hash
    ids (bounded by k — the unbounded-vocabulary fallback; the prefix filter
    is lossless under ANY total order, so the verified pair set is identical
    — pytest-checked). Returns (ray ObjectRef, vocab_n or None)."""
    import ray

    from dedup_ray.functions.vocab import exact_token_order, mg_token_order

    to = (
        exact_token_order(sets_ds)
        if vocab_rank == "exact"
        else mg_token_order(sets_ds)
    )
    if to is None:
        return None, None
    return ray.put(to), to.vocab_n


def _explode_prefix_fn(order_ref, threshold: float, flagged: bool):
    """Vectorized prefix-token explode: one probe (Arrow index_in + numpy
    gather), one lexsort, no per-doc Python (round-2 review #5 replaced a
    per-doc per-gram dict-probe loop). ``flagged=False`` emits only each
    doc's first L tokens in rarity order (Jaccard prefix filter);
    ``flagged=True`` emits every token with a bool marking the prefix
    (containment's index side)."""
    import ray

    def fn(b: pa.Table) -> pa.Table:
        to = ray.get(order_ref)
        g = b["grams"].combine_chunks()
        flat = g.flatten()
        lens = g.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        order_key, tok_id = to.probe(flat)
        n_docs = len(lens)
        total = int(lens.sum())
        doc_idx = np.repeat(np.arange(n_docs), lens)
        sort = np.lexsort((order_key, doc_idx))  # rarity order within doc
        ti = tok_id[sort]
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if n_docs else np.empty(0, np.int64)
        rank_in_doc = np.arange(total) - np.repeat(starts, lens)
        # ceil with an fp-safety epsilon: a LONGER prefix is always safe
        L = lens - np.ceil(threshold * lens - 1e-9).astype(np.int64) + 1
        pfx = rank_in_doc < np.repeat(L, lens)
        docs = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), lens)
        if flagged:
            return pa.table(
                {"tok": pa.array(ti, type=pa.int64()),
                 "doc_id": pa.array(docs, type=pa.int64()),
                 "pfx": pa.array(pfx, type=pa.bool_())}
            )
        return pa.table(
            {"tok": pa.array(ti[pfx], type=pa.int64()),
             "doc_id": pa.array(docs[pfx], type=pa.int64())}
        )

    return fn


def _to_ids_fn(order_ref):
    """Vectorized (doc_id, sorted tok_ids list) attr builder for the exact
    set-intersection verify — same probe, one lexsort, ListArray from
    offsets; no per-doc Python."""
    import ray

    def fn(b: pa.Table) -> pa.Table:
        to = ray.get(order_ref)
        g = b["grams"].combine_chunks()
        flat = g.flatten()
        lens = g.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        _, tok_id = to.probe(flat)
        n_docs = len(lens)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        sort = np.lexsort((tok_id, doc_idx))  # id-sorted within doc
        vals = tok_id[sort]
        offsets = np.concatenate([[0], np.cumsum(lens)])
        arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(vals, type=pa.int64()),
        )
        return pa.table({"image_id": b["doc_id"], "tok_ids": arr})

    return fn


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, n: int = 1, vocab_rank: str = "exact"
) -> pd.DataFrame:
    """EXACT token n-gram Jaccard near-dup pairs: all (a < b) with
    J(ngrams(a), ngrams(b)) >= threshold. Returns (a, b) sorted.

    Exact DISTRIBUTED plan via prefix filtering (Bayardo et al., "Scaling Up
    All Pairs Similarity Search", WWW'07): under any global token order, a
    pair with J >= t must share a token inside both docs' first
    L = |d| - ceil(t*|d|) + 1 tokens — so grouping on prefix tokens is a
    lossless candidate generator (unlike MinHash-LSH, which is probabilistic
    and would break oracle hash-identity). Tokens are ordered rarest-first
    from a shuffle-free doc-frequency pre-pass (per-block partial counts,
    driver merge — the cascade pre-pass pattern) to minimize candidates; the
    rank table is broadcast once. Verification is exact set intersection on
    sorted int token-ids, on candidate pairs only.
    """
    import ray

    def tokenize(b: pa.Table) -> pa.Table:
        toks = []
        for t in b["text"].to_pylist():
            words = (t or "").split()
            if n == 1:
                grams = sorted(set(words))
            else:
                grams = sorted(
                    {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
                )
            toks.append(grams)
        return pa.table(
            {"doc_id": b["doc_id"], "grams": pa.array(toks, type=pa.list_(pa.string()))}
        )

    sets_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow"
    ).materialize()  # consumed twice: df pre-pass + explode/attrs

    # ---- token order pre-pass (exact df ranks or Misra-Gries fallback) ----
    order_ref, _ = _vocab_order_ref(sets_ds, vocab_rank)
    if order_ref is None:
        return pd.DataFrame(columns=["a", "b"]).astype("int64")

    from dedup_ray.stages.grouped import grouped_runs
    from dedup_ray.stages.join import attach_pair_attrs

    exploded = sets_ds.map_batches(
        _explode_prefix_fn(order_ref, threshold, flagged=False),
        batch_format="pyarrow",
    )
    # strict salting: prefix-filter candidates are LOSSLESS by construction —
    # a star+chain degradation here would lose true pairs, so over-cap token
    # groups (stopword-ish prefix tokens) split exactly instead
    cand = _doc_candidate_pairs(exploded, "tok")

    # dedup candidates (a pair appears once per shared prefix token): key on
    # src_id co-locates all copies; drop consecutive duplicates of the
    # (src,dst)-sorted runs — vectorized, no delimiter-join pair keys
    from dedup_ray.stages.grouped import drop_sorted_dup_pairs

    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    )
    def vfy(b: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if b.num_rows == 0 or "src_tok_ids" not in b.column_names:
            return schema.empty_table()
        la = b["src_tok_ids"].combine_chunks()
        lb = b["dst_tok_ids"].combine_chunks()
        va, oa = la.values.to_numpy(zero_copy_only=False), la.offsets.to_numpy()
        vb, ob = lb.values.to_numpy(zero_copy_only=False), lb.offsets.to_numpy()
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):  # candidates only; numpy set ops per pair
            A = va[oa[i] : oa[i + 1]]
            B = vb[ob[i] : ob[i + 1]]
            if A.size == 0 or B.size == 0:
                continue
            if A.size > B.size:
                A, B = B, A
            idx = np.searchsorted(B, A)
            idx[idx >= B.size] = B.size - 1
            inter = int(np.count_nonzero(B[idx] == A))
            if inter and inter / (A.size + B.size - inter) >= threshold:
                keep[i] = True
        return pa.table(
            {
                "a": b["src_id"].filter(pa.array(keep)),
                "b": b["dst_id"].filter(pa.array(keep)),
            }
        )

    # verify fused into the attach task (post_fn, stages/join.py): attached
    # token-id lists reduce to confirmed pairs inside the task
    withsets = attach_pair_attrs(
        deduped,
        sets_ds.map_batches(_to_ids_fn(order_ref), batch_format="pyarrow"),
        ["tok_ids"],
        post_fn=vfy,
    )
    parts = [
        t for t in ray.get(withsets.to_arrow_refs())
        if t.num_rows and "a" in t.column_names
    ]
    if not parts:
        return pd.DataFrame(columns=["a", "b"]).astype("int64")
    out = pa.concat_tables(parts).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")


# BPE-ish token classes: letter runs | digit runs | punct runs — identical
# regex semantics in Python re and DuckDB RE2 for these classes
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_regex(sf_dir: str) -> rd.Dataset:
    """Per-doc BPE-ish token counts: (doc_id, n_tokens_re). One RE2 C++
    pass over the whole column — identical match semantics to Python
    re.findall for these ASCII token classes."""

    def fn(b: pa.Table) -> pa.Table:
        counts = pc.fill_null(pc.count_substring_regex(b["text"], TOKEN_REGEX), 0)
        return pa.table(
            {"doc_id": b["doc_id"], "n_tokens_re": counts.cast(pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3,
                       cfg: DedupConfig | None = None,
                       sigs: rd.Dataset | None = None) -> pd.DataFrame:
    """SimHash near-dup pairs over documents via 4x16-bit band candidates +
    exact Hamming verify (pigeonhole: complete for hamming <= 3). Returns
    (a, b, hamming). Fully distributed: exploded band rows -> grouped_runs
    pair generation -> broadcast-attach simhash -> vectorized hamming64;
    only confirmed pairs (tiny) reach the driver. ``sigs``: optional
    pre-materialized doc_signatures to share (see doc_neardup_clusters)."""
    cfg = cfg or DedupConfig()
    if sigs is None:
        sigs = doc_signatures(sf_dir, cfg).materialize()

    def explode(b: pa.Table) -> pa.Table:
        u = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        keys = np.empty(n * 4, dtype=np.int64)
        for band in range(4):
            k = (u >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            # combo key: 16-bit slice + band id, disjoint across bands
            keys[band * n : (band + 1) * n] = (k.astype(np.int64) << 2) | band
        return pa.table(
            {
                "combo": pa.array(keys),
                "doc_id": pa.array(np.tile(ids, 4), type=pa.int64()),
            }
        )

    from dedup_ray.stages.grouped import grouped_runs
    from dedup_ray.stages.join import attach_pair_attrs

    buckets = sigs.select_columns(["doc_id", "simhash"]).map_batches(
        explode, batch_format="pyarrow"
    )
    cand = _doc_candidate_pairs(buckets, "combo")
    attrs = sigs.map_batches(
        lambda b: pa.table({"image_id": b["doc_id"], "simhash": b["simhash"]}),
        batch_format="pyarrow",
    )
    def vfy(b: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("hamming", pa.int64())])
        if b.num_rows == 0 or "src_simhash" not in b.column_names:
            return schema.empty_table()
        d = hamming64(
            b["src_simhash"].to_numpy(zero_copy_only=False),
            b["dst_simhash"].to_numpy(zero_copy_only=False),
        )
        keep = d <= max_hamming
        return pa.table(
            {
                "a": b["src_id"].filter(pa.array(keep)),
                "b": b["dst_id"].filter(pa.array(keep)),
                "hamming": pa.array(d[keep].astype(np.int64)),
            }
        )

    import ray

    # verify fused into the attach task (post_fn, stages/join.py)
    withsig = attach_pair_attrs(cand, attrs, ["simhash"], post_fn=vfy)
    parts = [
        t for t in ray.get(withsig.to_arrow_refs())
        if t.num_rows and "a" in t.column_names
    ]
    if not parts:
        return pd.DataFrame(columns=["a", "b", "hamming"]).astype("int64")
    out = pa.concat_tables(parts).to_pandas()
    # cross-band duplicate candidates re-verify idempotently; dedup the
    # (tiny) confirmed pair set here
    return (
        out.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype("int64")
    )


def doc_jaccard_search(
    sf_dir: str, n_queries: int = 5, threshold: float = 0.5
) -> rd.Dataset:
    """Document similarity search: for each query doc (doc_id < n_queries,
    a deterministic stand-in for user-supplied queries), every corpus doc
    whose distinct-token Jaccard similarity is >= ``threshold``:
    (query_id, doc_id, jacc). The text twin of
    ``neardup.phash_hamming_search``; tokenless docs are excluded on both
    sides (Jaccard undefined).

    Scale shape: the query side is tiny by definition — its token sets are
    resolved with ONE predicate-pushed read (doc_id < n_queries prunes row
    groups) and broadcast into a single streamed map; per batch the work is
    one np.isin + bincount per query over the batch's distinct (token, doc)
    pairs. No shuffle, no corpus materialization. A standing MANY-query
    workload would swap in the MinHash-LSH candidate path
    (``minhash_neardup_docs``) behind the same output schema. jacc is a
    single int/int IEEE division — bit-identical to the DuckDB oracle."""
    import pyarrow.dataset as pads

    from dedup_ray.pipelines.curation import _token_lists
    from dedup_ray.sources.io import read_view
    from dedup_ray.stages.grouped import distinct_pairs

    def tok_sets(b: pa.Table) -> list[tuple[int, np.ndarray]]:
        toks, counts = _token_lists(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t, d = distinct_pairs(toks, np.repeat(ids, counts))
        out = []
        for i in np.unique(d):
            s = np.sort(t[d == i])
            if s.size:
                out.append((int(i), s))
        return out

    qtab = read_view(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        predicate=pads.field("doc_id") < n_queries,
    ).map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], n_queries)),
        batch_format="pyarrow",
    ).take_all()
    qb = pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in qtab], type=pa.int64()),
         "text": pa.array([r["text"] for r in qtab], type=pa.string())}
    )
    queries = tok_sets(qb)  # [(query_id, sorted distinct tokens)]

    out_schema = pa.schema(
        [("query_id", pa.int64()), ("doc_id", pa.int64()),
         ("jacc", pa.float64())]
    )

    def probe(b: pa.Table) -> pa.Table:
        toks, counts = _token_lists(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t, d = distinct_pairs(toks, np.repeat(ids, counts))
        if t.size == 0:
            return out_schema.empty_table()
        # dense doc index for bincount
        uids, dx = np.unique(d, return_inverse=True)
        sizes = np.bincount(dx)
        outs = []
        for qid, qset in queries:
            inter = np.bincount(dx[np.isin(t, qset)], minlength=len(uids))
            union = sizes + qset.size - inter
            jacc = inter / union  # exact: one IEEE int/int division
            keep = (jacc >= threshold) & (uids != qid)
            if keep.any():
                outs.append(pa.table(
                    {"query_id": pa.array(
                        np.full(int(keep.sum()), qid), type=pa.int64()),
                     "doc_id": pa.array(uids[keep], type=pa.int64()),
                     "jacc": pa.array(jacc[keep], type=pa.float64())}
                ))
        return pa.concat_tables(outs) if outs else out_schema.empty_table()

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow"
    )


def minhash_dedup_keep(
    sf_dir: str, cfg: DedupConfig | None = None
) -> rd.Dataset:
    """Near-dup dedup APPLY — the surviving corpus: every document except
    non-keeper members of MinHash-LSH clusters (keeper = min doc_id, the
    same deterministic rule as dedup_keep_first): (doc_id, lang, source).

    This is the operator a user actually runs to shrink a corpus; the
    clustering (minhash_neardup_clusters) already keeps everything
    distributed except the confirmed EDGE set. The drop set is bounded by
    the duplicate count, so it broadcasts as one sorted int64 array and
    each batch filters via np.searchsorted; at a duplicate volume too big
    to broadcast, swap the membership probe for a hash anti-join
    (stages/join.shuffle_join how='anti' shape) — the read side is
    unchanged."""
    import ray

    cfg = cfg or DedupConfig()
    cl = minhash_neardup_clusters(sf_dir, cfg)
    drop = np.sort(
        cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"].to_numpy(
            dtype=np.int64
        )
    )
    ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(d):
            pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
            hit = d[pos] == ids
        else:
            hit = np.zeros(len(ids), bool)
        m = pa.array(~hit)
        return pa.table(
            {"doc_id": b["doc_id"].filter(m),
             "lang": b["lang"].filter(m),
             "source": b["source"].filter(m)}
        )

    return _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        keep, batch_format="pyarrow"
    )


def edit_distance_pairs(
    sf_dir: str, cfg: DedupConfig | None = None, rel_denom: int = 5
) -> pd.DataFrame:
    """Edit-similarity near-dup pairs: (a, b, edit_dist) for every MinHash-
    LSH candidate pair whose exact Levenshtein distance satisfies
    rel_denom * dist <= max(len_a, len_b) (default: distance <= 20% of the
    longer text). Generalizes the reference's exact-equality verify tier
    (/root/reference/src/hasher.rs:30-47) to bounded character edits.

    Distributed shape mirrors minhash_neardup_clusters: band-bucket
    grouped_runs candidates -> distributed pair dedup -> texts attached to
    candidate PAIRS ONLY via attach_pair_attrs -> per-pair banded DP verify
    (functions/editdist.levenshtein: numpy row scans, early exit above the
    cap). Only confirmed pairs — bounded by the duplicate volume — reach
    the driver; the text table never materializes."""
    from dedup_ray.functions.editdist import levenshtein
    from dedup_ray.stages.grouped import drop_sorted_dup_pairs, grouped_runs
    from dedup_ray.stages.join import attach_pair_attrs

    import ray

    cfg = cfg or DedupConfig()
    _, cand = _minhash_band_candidates(sf_dir, cfg)
    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    )
    texts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({"image_id": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
    )
    def vfy(b: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("edit_dist", pa.int64())]
        )
        if b.num_rows == 0 or "src_text" not in b.column_names:
            return schema.empty_table()
        ta = b["src_text"].to_pylist()
        tb = b["dst_text"].to_pylist()
        dists = np.empty(b.num_rows, dtype=np.int64)
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):  # candidate pairs only; DP is numpy
            cap = max(len(ta[i]), len(tb[i])) // rel_denom
            d = levenshtein(ta[i], tb[i], cap=cap)
            if d <= cap:
                keep[i], dists[i] = True, d
        m = pa.array(keep)
        return pa.table(
            {
                "a": b["src_id"].filter(m),
                "b": b["dst_id"].filter(m),
                "edit_dist": pa.array(dists[keep], type=pa.int64()),
            }
        )

    # verify fused into the attach task (post_fn, stages/join.py): full
    # texts on both endpoints never cross the object store
    withtext = attach_pair_attrs(deduped, texts, ["text"], post_fn=vfy)
    parts = [
        t for t in ray.get(withtext.to_arrow_refs())
        if t.num_rows and "a" in t.column_names
    ]
    if not parts:
        return pd.DataFrame(
            columns=["a", "b", "edit_dist"]
        ).astype("int64")
    out = pa.concat_tables(parts).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")


def minhash_keep_longest(
    sf_dir: str, cfg: DedupConfig | None = None
) -> rd.Dataset:
    """Near-dup dedup APPLY with a QUALITY-priority keeper: per MinHash-LSH
    cluster keep the LONGEST document (tie: min doc_id) instead of the min
    id — the keeper rule as a pluggable policy, generalizing the
    reference's shortest-path keeper (/root/reference/src/actions.rs:21-26,
    which also ranks by a quality proxy, not by identity). Returns the
    surviving corpus (doc_id, lang, source).

    Cluster membership is bounded by the duplicate volume, so member
    lengths are fetched with ONE streamed projection-pruned pass over
    (doc_id, n_chars) filtered against the broadcast member set; keeper
    selection is a driver-side sort of that bounded table; the final keep
    filter is the same broadcast searchsorted probe as minhash_dedup_keep."""
    import ray

    cfg = cfg or DedupConfig()
    cl = minhash_neardup_clusters(sf_dir, cfg)
    members = np.sort(cl["doc_id"].to_numpy(dtype=np.int64))
    mem_ref = ray.put(members)

    def member_lens(b: pa.Table) -> pa.Table:
        m = ray.get(mem_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(m):
            pos = np.minimum(np.searchsorted(m, ids), len(m) - 1)
            hit = pa.array(m[pos] == ids)
        else:
            hit = pa.array(np.zeros(len(ids), bool))
        return pa.table(
            {"doc_id": b["doc_id"].filter(hit),
             "n_chars": b["n_chars"].filter(hit)}
        )

    len_tables = [
        t for t in ray.get(
            _docs(sf_dir, ["doc_id", "n_chars"])
            .map_batches(member_lens, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "doc_id" in t.column_names
    ]
    if len_tables:
        lens = pa.concat_tables(len_tables).to_pandas()
        merged = cl.merge(lens, on="doc_id")
        merged = merged.sort_values(
            ["cluster_id", "n_chars", "doc_id"],
            ascending=[True, False, True],
        )
        keepers = merged.groupby("cluster_id", sort=False).head(1)["doc_id"]
        drop = np.sort(
            np.setdiff1d(members, keepers.to_numpy(dtype=np.int64))
        )
    else:
        drop = np.array([], dtype=np.int64)
    drop_ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(d):
            pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
            hit = d[pos] == ids
        else:
            hit = np.zeros(len(ids), bool)
        m = pa.array(~hit)
        return pa.table(
            {"doc_id": b["doc_id"].filter(m),
             "lang": b["lang"].filter(m),
             "source": b["source"].filter(m)}
        )

    return _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        keep, batch_format="pyarrow"
    )


def normalized_dedup_groups(sf_dir: str) -> pa.Table:
    """Duplicate groups by NORMALIZED text — casefolded, whitespace-
    collapsed — the cascade's pluggable key function swapped for a
    canonicalizing one (the §2.7 `group_by_hash(files, hash_fn)` extension
    surface, /root/reference/src/hasher.rs:51-54): (rep_id, n_dups),
    HAVING n>=2, rep = min doc_id. Catches re-encoded/reflowed copies that
    exact_dedup_groups misses. All three normalization kernels are one RE2
    / Arrow C++ pass per batch."""
    schema = pa.schema([("rep_id", pa.int64()), ("n_dups", pa.int64())])

    def add_norm_hash(b: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(b["text"], r"\s+", " ")
            )
        )
        h = [
            hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
            for t in norm.to_pylist()
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "text_hash": pa.array(h, type=pa.string())}
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_norm_hash, batch_format="pyarrow"
    )

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def emit_runs(g: pa.Table) -> pa.Table:
        keys = np.asarray(g["text_hash"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return schema.empty_table()
        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        sizes = np.diff(bounds)
        dup = sizes >= 2
        return pa.table(
            {
                "rep_id": pa.array(ids[starts[dup]], type=pa.int64()),
                "n_dups": pa.array(sizes[dup], type=pa.int64()),
            }
        )

    out = grouped_runs(ds, "text_hash", emit_runs,
                       sort_cols=["text_hash", "doc_id"])
    import ray

    tables = [t for t in ray.get(out.to_arrow_refs())
              if t.num_rows and "rep_id" in t.column_names]
    return pa.concat_tables(tables) if tables else schema.empty_table()


def neardup_cluster_sizes(
    sf_dir: str, cfg: DedupConfig | None = None
) -> pa.Table:
    """Near-dup cluster size histogram: (cluster_size, n_clusters) — the
    reference's DuplicateReport aggregate (/root/reference/src/output.rs:
    39-73) over the MinHash-LSH clustering. The cluster table is already
    bounded by the duplicate volume, so the histogram is a driver-side
    value_counts over it; everything upstream stays distributed."""
    cfg = cfg or DedupConfig()
    cl = minhash_neardup_clusters(sf_dir, cfg)
    schema = pa.schema([("cluster_size", pa.int64()), ("n_clusters", pa.int64())])
    if not len(cl):
        return schema.empty_table()
    sizes = cl.groupby("cluster_id").size()
    hist = sizes.value_counts().sort_index()
    return pa.table(
        {"cluster_size": pa.array(hist.index.to_numpy(), pa.int64()),
         "n_clusters": pa.array(hist.to_numpy(), pa.int64())}
    )


def containment_pairs(
    sf_dir: str, threshold: float = 0.8, vocab_rank: str = "exact"
) -> rd.Dataset:
    """EXACT token containment near-dup pairs: all (a < b) where
    |A∩B| >= threshold·min(|A|,|B|) — the ASYMMETRIC partial-duplicate
    detector (quotes, boilerplate, doc-inside-doc) that Jaccard misses
    when sizes differ. Returns (a, b) sorted.

    Lossless distributed candidates, a containment twist on the Bayardo
    prefix filter: order tokens rarest-first (shuffle-free df pre-pass,
    rank table broadcast once); every doc posts ALL its token ids
    (inverted-index side, linear in corpus tokens) with a flag marking
    the first L = |d| - ceil(t·|d|) + 1 of them (prefix side). If A is
    the smaller of a qualifying pair, at most (1-t)·|A| of A's tokens
    miss B, so one of A's L prefix tokens IS in B — the pair meets in
    that token's group. Pair generation pairs prefix-flagged members
    with all members; verification is exact sorted-int intersection with
    the all-integer test k·inter >= k·t·min (no float ratios). The
    index side is the scale knob: rarest-first keeps groups small, and
    hot (common) tokens are prefix-flagged only in near-all-common docs."""
    import ray
    from dedup_ray.stages.grouped import (drop_sorted_dup_pairs, grouped_runs,
                                          run_starts)
    from dedup_ray.stages.join import attach_pair_attrs

    def tokenize(b: pa.Table) -> pa.Table:
        toks = [sorted(set((t or "").split())) for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"],
             "grams": pa.array(toks, type=pa.list_(pa.string()))}
        )

    sets_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow"
    ).materialize()  # consumed twice: df pre-pass + explode/attrs

    order_ref, vocab_n = _vocab_order_ref(sets_ds, vocab_rank)
    if order_ref is None:
        return rd.from_arrow(
            pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        )

    explode_flagged = _explode_prefix_fn(order_ref, threshold, flagged=True)

    def flagged_pairs(g: pa.Table) -> pa.Table:
        # a pair qualifies only if >=1 side posted a prefix token, so
        # generate (prefix x prefix upper-triangle) + (prefix x rest)
        # DIRECTLY — O(|P|·run) instead of materializing the full O(run²)
        # triangle and masking (hot tokens have near-full runs but tiny
        # prefix sets, which is where the old triu blew up)
        keys = g["tok"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        pfx = g["pfx"].to_numpy(zero_copy_only=False)
        starts = run_starts(keys)
        bounds = np.append(starts, len(keys))
        out_a, out_b = [], []
        for r in np.flatnonzero(np.diff(bounds) >= 2):
            lo, hi = bounds[r], bounds[r + 1]
            run = ids[lo:hi]
            rp = pfx[lo:hi]
            p = np.sort(run[rp])
            n = run[~rp]
            if p.size >= 2:
                iu, ju = np.triu_indices(p.size, 1)
                out_a.append(p[iu])
                out_b.append(p[ju])
            if p.size and n.size:
                pa_ = np.repeat(p, n.size)
                nb = np.tile(n, p.size)
                out_a.append(np.minimum(pa_, nb))
                out_b.append(np.maximum(pa_, nb))
        if not out_a:
            return pa.schema(
                [("src_id", pa.int64()), ("dst_id", pa.int64())]
            ).empty_table()
        return pa.table(
            {"src_id": pa.array(np.concatenate(out_a), type=pa.int64()),
             "dst_id": pa.array(np.concatenate(out_b), type=pa.int64())}
        )

    exploded = sets_ds.map_batches(explode_flagged, batch_format="pyarrow")
    cand = grouped_runs(exploded, "tok", flagged_pairs)
    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    )
    # threshold as an exact rational k_num/k_den for the integer test
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1000)

    def vfy(b: pa.Table) -> pa.Table:
        # fully vectorized exact intersection: per-pair token lists are
        # sorted, so offsetting each pair's ids by pair_index·VOCAB makes
        # ONE global searchsorted answer every pair at once (the flat
        # array stays globally sorted); per-pair hits fold with bincount.
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if b.num_rows == 0 or "src_tok_ids" not in b.column_names:
            return schema.empty_table()
        la = b["src_tok_ids"].combine_chunks()
        lb = b["dst_tok_ids"].combine_chunks()
        va, oa = la.values.to_numpy(zero_copy_only=False), la.offsets.to_numpy()
        vb, ob = lb.values.to_numpy(zero_copy_only=False), lb.offsets.to_numpy()
        na = np.diff(oa).astype(np.int64)
        nb = np.diff(ob).astype(np.int64)
        if vocab_n is not None:
            V = np.int64(vocab_n)  # int closure (dense exact-rank id space)
        else:
            # mg mode: ids are 62-bit hashes — densify per batch (monotone
            # map keeps each list sorted) so the segment-offset trick fits
            u = np.unique(np.concatenate([va, vb]))
            va = np.searchsorted(u, va)
            vb = np.searchsorted(u, vb)
            V = np.int64(len(u) + 1)
        seg_a = np.repeat(np.arange(b.num_rows, dtype=np.int64), na)
        seg_b = np.repeat(np.arange(b.num_rows, dtype=np.int64), nb)
        av = va.astype(np.int64) + seg_a * V
        bv = vb.astype(np.int64) + seg_b * V
        if bv.size:
            idx = np.minimum(np.searchsorted(bv, av), bv.size - 1)
            hits = bv[idx] == av
            inter = np.bincount(seg_a[hits], minlength=b.num_rows)
        else:
            inter = np.zeros(b.num_rows, dtype=np.int64)
        mn = np.minimum(na, nb)
        keep = (mn > 0) & (
            frac.denominator * inter >= frac.numerator * mn
        )
        return pa.table(
            {"a": b["src_id"].filter(pa.array(keep)),
             "b": b["dst_id"].filter(pa.array(keep))}
        )

    # STREAMING result: at sf0.1 this is a 10M-row pair set — it stays a
    # Dataset (write/consume downstream) instead of a driver concat; the
    # harness compare canonicalizes order itself. Verify is fused into the
    # attach task (post_fn, stages/join.py): attached token-id lists reduce
    # to confirmed pairs inside the task.
    return attach_pair_attrs(
        deduped,
        sets_ds.map_batches(_to_ids_fn(order_ref), batch_format="pyarrow"),
        ["tok_ids"],
        post_fn=vfy,
    )


def decontaminate_docs_fuzzy(
    sf_dir: str, eval_source: str = "src0", cfg: DedupConfig | None = None
) -> rd.Dataset:
    """FUZZY benchmark decontamination — the near-dup upgrade of
    decontaminate_docs (exact shingle overlap): flag training docs whose
    MinHash-estimated Jaccard similarity to ANY eval-source doc clears the
    dedup threshold, catching paraphrased / lightly-edited benchmark
    leakage that exact n-gram matching misses. Returns distinct (doc_id)
    of contaminated TRAINING docs (the eval side is never flagged).

    Scale shape: reuses the distributed MinHash-LSH candidate generator
    (_minhash_band_candidates — shingle -> sign -> band groupby) over the
    WHOLE corpus, attaches signatures and the source tag to candidate
    pairs (broadcast at this scale, hash-join at cluster scale), verifies
    est-Jaccard vectorized, keeps only train x eval pairs, and dedups the
    flagged ids with one tiny groupby. No driver ever sees signatures."""
    cfg = cfg or DedupConfig()
    sigs, cand = _minhash_band_candidates(sf_dir, cfg)

    from dedup_ray.stages.join import attach_pair_attrs

    attrs = sigs.map_batches(
        lambda b: pa.table(
            {"image_id": b["doc_id"], "minhash_sig": b["minhash_sig"]}
        ),
        batch_format="pyarrow",
    )
    withsig = attach_pair_attrs(cand, attrs, ["minhash_sig"])
    src_attrs = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        lambda b: pa.table({"image_id": b["doc_id"], "source": b["source"]}),
        batch_format="pyarrow",
    )
    def vfy(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        if b.num_rows == 0 or "src_minhash_sig" not in b.column_names:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        sa = sigs_from_arrow(b["src_minhash_sig"])
        sb = sigs_from_arrow(b["dst_minhash_sig"])
        sim = (sa == sb).mean(axis=1) >= cfg.jaccard_threshold
        se = pc.equal(b["src_source"], eval_source).to_numpy(
            zero_copy_only=False
        )
        de = pc.equal(b["dst_source"], eval_source).to_numpy(
            zero_copy_only=False
        )
        keep = sim & (se ^ de)  # exactly one endpoint is the eval set
        flagged = np.where(se, b["dst_id"].to_numpy(zero_copy_only=False),
                           b["src_id"].to_numpy(zero_copy_only=False))[keep]
        return pa.table({"doc_id": pa.array(np.unique(flagged), pa.int64())})

    schema = pa.schema([("doc_id", pa.int64())])
    # verify fused into the SECOND attach (post_fn): the sig-laden pair
    # batches reduce to flagged doc ids inside the task
    withsrc = attach_pair_attrs(withsig, src_attrs, ["source"], post_fn=vfy)
    agg = withsrc.groupby("doc_id").count()
    return agg.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.int64())})
        if b.num_rows and "doc_id" in b.column_names
        else schema.empty_table(),
        batch_format="pyarrow",
    )


def source_overlap_matrix(
    sf_dir: str, cfg: DedupConfig | None = None
) -> pa.Table:
    """Cross-source near-duplicate contamination matrix: for each unordered
    source pair, the number of verified MinHash near-dup doc pairs with one
    endpoint in each: (source_a, source_b, n_pairs), source_a <= source_b,
    diagonal included. THE curation dashboard number — which corpus slices
    leak into which — generalizing decontaminate_docs_fuzzy's one-direction
    train x eval check to the full pairwise matrix.

    Distributed shape shares every stage with the near-dup family: band-
    bucket grouped_runs candidates -> distributed pair dedup (the SQL cand
    is DISTINCT, so repeats must go before counting) -> signatures AND
    sources attached to candidate pairs only via attach_pair_attrs ->
    vectorized est-Jaccard verify -> per-batch (source_a, source_b, n)
    partials folded driver-side (bounded by |sources|²). Neither the
    signature table nor the pair list ever materializes on the driver."""
    from dedup_ray.stages.grouped import drop_sorted_dup_pairs, grouped_runs
    from dedup_ray.stages.join import attach_pair_attrs

    import ray

    cfg = cfg or DedupConfig()
    sigs, cand = _minhash_band_candidates(sf_dir, cfg)
    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    )
    sig_attrs = sigs.map_batches(
        lambda b: pa.table(
            {"image_id": b["doc_id"], "minhash_sig": b["minhash_sig"]}
        ),
        batch_format="pyarrow",
    )
    src_attrs = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        lambda b: pa.table({"image_id": b["doc_id"], "source": b["source"]}),
        batch_format="pyarrow",
    )
    withsig = attach_pair_attrs(deduped, sig_attrs, ["minhash_sig"])

    part_schema = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string()),
         ("n", pa.int64())]
    )

    def vfy_count(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        if b.num_rows == 0 or "src_minhash_sig" not in b.column_names:
            return part_schema.empty_table()
        sa = sigs_from_arrow(b["src_minhash_sig"])
        sb = sigs_from_arrow(b["dst_minhash_sig"])
        keep = pa.array((sa == sb).mean(axis=1) >= cfg.jaccard_threshold)
        s1 = b["src_source"].filter(keep)
        s2 = b["dst_source"].filter(keep)
        lo = pc.min_element_wise(s1, s2)
        hi = pc.max_element_wise(s1, s2)
        g = pa.table({"source_a": lo, "source_b": hi}).group_by(
            ["source_a", "source_b"]
        ).aggregate([("source_a", "count")])
        return pa.table(
            {"source_a": g["source_a"], "source_b": g["source_b"],
             "n": g["source_a_count"].cast(pa.int64())}
        )

    # count-verify fused into the second attach (post_fn, stages/join.py)
    withsrc = attach_pair_attrs(
        withsig, src_attrs, ["source"], post_fn=vfy_count
    )
    acc: dict[tuple, int] = {}
    for t in ray.get(withsrc.to_arrow_refs()):
        if t.num_rows == 0 or "source_a" not in t.column_names:
            continue
        for sa_, sb_, n in zip(
            t["source_a"].to_pylist(), t["source_b"].to_pylist(),
            t["n"].to_pylist(),
        ):
            acc[(sa_, sb_)] = acc.get((sa_, sb_), 0) + n
    keys = sorted(acc)
    return pa.table(
        {"source_a": pa.array([k[0] for k in keys], pa.string()),
         "source_b": pa.array([k[1] for k in keys], pa.string()),
         "n_pairs": pa.array([acc[k] for k in keys], pa.int64())}
    )


def minhash_funnel_stats(
    sf_dir: str, cfg: DedupConfig | None = None
) -> pd.DataFrame:
    """Candidate-funnel observability for the MinHash-LSH family: docs ->
    docs-with-signatures -> colliding band buckets -> distinct candidate
    pairs -> verified pairs, as ONE summary row. These are the numbers an
    operator watches to tune bands/rows_per_band (candidates per verified
    pair = LSH precision; buckets per doc = shuffle fan-out) before a
    100 TB run — the funnel IS the cost model, so it ships as a first-class
    query, bit-exact against the same-constants DuckDB oracle.

    Scale shape: every count folds map-side. Bucket collisions are counted
    INSIDE the same combo-keyed grouped_runs that generates the pairs
    (union-tagged sentinel rows src_id=-1 carry per-bucket partials — no
    second shuffle over the exploded bucket table); distinct pairs ride the
    pair-dedup shuffle the verify path needs anyway; verified pairs fold
    from per-batch counts. Driver state: a handful of integers.
    """
    cfg = cfg or DedupConfig()
    sigs = doc_signatures(sf_dir, cfg).materialize()

    def sig_partial(b: pa.Table) -> pa.Table:
        has = b["has_sig"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"n": pa.array([b.num_rows], pa.int64()),
             "with_sig": pa.array([int(has.sum())], pa.int64())}
        )

    import ray

    n_docs = n_with_sig = 0
    for t in ray.get(
        sigs.map_batches(sig_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "n" in t.column_names:
            n_docs += sum(t["n"].to_pylist())
            n_with_sig += sum(t["with_sig"].to_pylist())

    from dedup_ray.stages.grouped import (
        drop_sorted_dup_pairs,
        grouped_runs,
        run_starts,
    )

    # funnel semantics: n_buckets counts PRE-salt band buckets (the metric's
    # definition, shared with the oracle), so this fused pass stays unsalted
    # — shared vectorized kernel, no cap (diagnostic query; the production
    # candidate path _doc_candidate_pairs is the skew-safe one)
    from dedup_ray.stages.pairgen import pairs_from_runs

    pairs_fn = pairs_from_runs("combo", "doc_id", cap=None)

    def pairs_and_bucket_count(g: pa.Table) -> pa.Table:
        keys = g["combo"].to_numpy(zero_copy_only=False)
        sz = np.diff(np.append(run_starts(keys), len(keys)))
        nb = int((sz >= 2).sum())
        pairs = pairs_fn(g)
        sentinel = pa.table(
            {"src_id": pa.array([-1], pa.int64()),
             "dst_id": pa.array([nb], pa.int64())}
        )
        return pa.concat_tables([pairs, sentinel])

    tagged = grouped_runs(
        _band_buckets(sigs, cfg), "combo", pairs_and_bucket_count,
        sort_cols=["combo", "doc_id"],
    ).materialize()

    n_buckets = 0
    for t in ray.get(tagged.to_arrow_refs()):
        if t.num_rows and "src_id" in t.column_names:
            ft = t.filter(pa.compute.equal(t["src_id"], -1))
            n_buckets += sum(ft["dst_id"].to_pylist())
    cand = tagged.map_batches(
        lambda b: b.filter(pa.compute.not_equal(b["src_id"], -1))
        if b.num_rows and "src_id" in b.column_names else b,
        batch_format="pyarrow",
    )

    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    ).materialize()
    n_candidate_pairs = deduped.count()

    from dedup_ray.stages.join import attach_pair_attrs

    attrs = sigs.map_batches(
        lambda b: pa.table(
            {"image_id": b["doc_id"], "minhash_sig": b["minhash_sig"]}
        ),
        batch_format="pyarrow",
    )
    def vfy_count(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        if b.num_rows == 0 or "src_minhash_sig" not in b.column_names:
            return pa.table({"nv": pa.array([0], pa.int64())})
        sa = sigs_from_arrow(b["src_minhash_sig"])
        sb = sigs_from_arrow(b["dst_minhash_sig"])
        keep = (sa == sb).mean(axis=1) >= cfg.jaccard_threshold
        return pa.table({"nv": pa.array([int(keep.sum())], pa.int64())})

    # count-verify fused into the attach task (post_fn, stages/join.py)
    withsig = attach_pair_attrs(
        deduped, attrs, ["minhash_sig"], post_fn=vfy_count
    )
    n_verified = 0
    for t in ray.get(withsig.to_arrow_refs()):
        if t.num_rows and "nv" in t.column_names:
            n_verified += sum(t["nv"].to_pylist())

    return pd.DataFrame(
        [{
            "n_docs": int(n_docs),
            "n_with_sig": int(n_with_sig),
            "n_buckets": int(n_buckets),
            "n_candidate_pairs": int(n_candidate_pairs),
            "n_verified_pairs": int(n_verified),
        }]
    ).astype("int64")


def prefix_dup_groups(sf_dir: str, n_chars: int = 32) -> rd.Dataset:
    """Truncation-duplicate groups: documents sharing their first
    ``n_chars`` CHARACTERS, grouped HAVING >= 2 — the web-scrape staple for
    catching truncated/re-crawled copies that exact-hash dedup misses
    because the tails differ: (doc_id, group_rep), group_rep = min doc_id
    of the prefix group (the usual deterministic keeper rule, D3).

    Scale shape: one map computes the prefix (Python slicing is
    character-based exactly like the oracle's ``substr``), then ONE
    hash-partitioned grouped_runs shuffle keyed on it with a vectorized
    run kernel (run_starts + two repeats) — per-group Python never runs.
    Only (doc_id, 32-char prefix) rows move; at 10^12 rows the prefix
    would be digested to 8 bytes before the shuffle (collision-free in
    practice), kept raw here for oracle byte-parity."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def pfx(b: pa.Table) -> pa.Table:
        # SQL-mirroring NULL semantics (round-2 advice): the oracle's
        # substr(NULL,..) is NULL, and its JOIN ... USING (pfx) never
        # matches NULL — so NULL-text docs are EXCLUDED here too instead of
        # being coalesced into the '' group.
        texts = b["text"].to_pylist()
        keep = pa.array([t is not None for t in texts])
        b = b.filter(keep)
        p = [t[:n_chars] for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"], "pfx": pa.array(p, type=pa.string())}
        )

    keyed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        pfx, batch_format="pyarrow"
    )
    out_schema = pa.schema([("doc_id", pa.int64()), ("group_rep", pa.int64())])

    def emit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        p = np.asarray(g["pfx"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        starts = run_starts(p)
        sizes = np.diff(np.append(starts, len(p)))
        rep = np.repeat(ids[starts], sizes)  # sorted (pfx, id): min id first
        keep = np.repeat(sizes >= 2, sizes)
        return pa.table(
            {"doc_id": pa.array(ids[keep], type=pa.int64()),
             "group_rep": pa.array(rep[keep], type=pa.int64())}
        )

    return grouped_runs(keyed, "pfx", emit, sort_cols=["pfx", "doc_id"])


def simhash_dedup_keep(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash dedup APPLY — the surviving corpus after collapsing SimHash
    near-dup components (keeper = min doc_id per connected component):
    (doc_id, lang, source). The bitwise twin of ``minhash_dedup_keep``:
    same keeper rule and broadcast drop-set probe, but the duplicate
    relation is hamming(simhash) <= max_hamming closed under connectivity.

    Scale shape: everything up to confirmed pairs is the fully distributed
    ``simhash_near_pairs`` path (band-bucket grouped_runs + vectorized
    hamming verify); the confirmed pair set is dup-bounded, so components
    fold on the driver and the drop set broadcasts as one sorted int64
    array — swap the probe for a hash anti-join at extreme dup volume,
    exactly as minhash_dedup_keep documents."""
    import ray

    pairs = simhash_near_pairs(sf_dir, max_hamming)
    edges = [
        (f"{a:012d}", f"{b:012d}") for a, b in zip(pairs["a"], pairs["b"])
    ]
    comp = connected_components(edges)
    drop = np.sort(
        np.array(
            [int(k) for k, v in comp.items() if int(k) != int(v)],
            dtype=np.int64,
        )
    )
    ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(d):
            pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
            hit = d[pos] == ids
        else:
            hit = np.zeros(len(ids), bool)
        m = pa.array(~hit)
        return pa.table(
            {"doc_id": b["doc_id"].filter(m),
             "lang": b["lang"].filter(m),
             "source": b["source"].filter(m)}
        )

    return _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        keep, batch_format="pyarrow"
    )


def minhash_threshold_sweep(
    sf_dir: str, cfg: DedupConfig | None = None
) -> pd.DataFrame:
    """Jaccard-threshold tuning curve in ONE pass: for every distinct
    signature-agreement count over the deduped MinHash-LSH candidate pairs,
    the number of pairs at that estimated similarity:
    (n_matches, est_jaccard, n_pairs). Sweeping the verify threshold is
    then a cumulative sum over this table instead of a re-run per
    threshold — the knob-tuning companion to ``minhash_funnel_stats``
    (which fixes the threshold) and ``phash_distance_histogram`` (the
    image-side analog).

    Scale shape: candidates come from the distributed band grouped_runs,
    cross-band duplicates are deduped DISTRIBUTED (drop_sorted_dup_pairs —
    the histogram must count each pair once), signatures attach to pair
    rows only, and each batch folds to a (num_perm+1)-long bincount —
    driver state is one small int vector. est_jaccard is the same single
    IEEE division (matches / num_perm) the verify stage uses, so the
    DuckDB oracle matches bit-exactly."""
    import ray

    from dedup_ray.stages.grouped import drop_sorted_dup_pairs, grouped_runs
    from dedup_ray.stages.join import attach_pair_attrs

    cfg = cfg or DedupConfig()
    sigs, cand = _minhash_band_candidates(sf_dir, cfg)
    deduped = grouped_runs(
        cand, "src_id", lambda g: drop_sorted_dup_pairs(g, "src_id", "dst_id"),
        sort_cols=["src_id", "dst_id"],
    )
    attrs = sigs.map_batches(
        lambda b: pa.table(
            {"image_id": b["doc_id"], "minhash_sig": b["minhash_sig"]}
        ),
        batch_format="pyarrow",
    )
    def hist(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.signatures import sigs_from_arrow

        if b.num_rows == 0 or "src_minhash_sig" not in b.column_names:
            return pa.table({"h": pa.array([], type=pa.int64())})
        sa = sigs_from_arrow(b["src_minhash_sig"])
        sb = sigs_from_arrow(b["dst_minhash_sig"])
        matches = (sa == sb).sum(axis=1).astype(np.int64)
        counts = np.bincount(matches, minlength=cfg.num_perm + 1)
        return pa.table({"h": pa.array(counts, type=pa.int64())})

    # histogram fold fused into the attach task (post_fn, stages/join.py)
    withsig = attach_pair_attrs(deduped, attrs, ["minhash_sig"], post_fn=hist)
    acc = np.zeros(cfg.num_perm + 1, dtype=np.int64)
    for t in ray.get(withsig.to_arrow_refs()):
        if t.num_rows and "h" in t.column_names:
            # one (num_perm+1)-long partial per processed batch; blocks may
            # pack several — fold them all
            h = t["h"].to_numpy(zero_copy_only=False)
            acc += h.reshape(-1, cfg.num_perm + 1).sum(axis=0)
    nz = np.flatnonzero(acc)
    return pd.DataFrame(
        {
            "n_matches": nz.astype("int64"),
            "est_jaccard": nz / cfg.num_perm,
            "n_pairs": acc[nz].astype("int64"),
        }
    )


# single-entry memo: clusters/report/keep run back-to-back over the same
# corpus (bench does exactly this), so the three-tier edge computation runs
# ONCE per (sf_dir, config) instead of three times (round-2 advice). One
# entry bounds driver memory; a different corpus/config evicts it.
_DOC_NEARDUP_CACHE: dict[tuple, tuple] = {}


def _doc_neardup_state(
    sf_dir: str, cfg: DedupConfig, max_hamming: int
) -> tuple[list, list, list, dict]:
    """Shared edge/component computation for the composed document
    flagship: returns (exact_edges, minhash_edges, simhash_edges,
    components) with edges as zero-padded id-string tuples. Each tier is
    its fully distributed path; one signature pass is shared by the
    MinHash and SimHash tiers. Memoized per (sf_dir, config_hash,
    max_hamming) — see _DOC_NEARDUP_CACHE."""
    import ray

    memo_key = (sf_dir, (cfg or DedupConfig()).config_hash(), max_hamming)
    hit = _DOC_NEARDUP_CACHE.get(memo_key)
    if hit is not None:
        return hit

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    cfg = cfg or DedupConfig()

    # tier 1: exact-text star edges (rep=min member -> others), distributed
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def star_edges(g: pa.Table) -> pa.Table:
        keys = np.asarray(g["text_hash"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pair_schema.empty_table()
        starts = run_starts(keys)
        sizes = np.diff(np.append(starts, len(keys)))
        rep = np.repeat(ids[starts], sizes)  # sorted (hash, id): min first
        member = ids
        nonrep = member != rep
        return pa.table(
            {"a": pa.array(rep[nonrep], type=pa.int64()),
             "b": pa.array(member[nonrep], type=pa.int64())}
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _add_text_hash, batch_format="pyarrow"
    )
    exact_ds = grouped_runs(
        hashed.select_columns(["doc_id", "text_hash"]), "text_hash",
        star_edges, sort_cols=["text_hash", "doc_id"],
    )
    exact_tables = [
        t for t in ray.get(exact_ds.to_arrow_refs())
        if t.num_rows and "a" in t.column_names
    ]

    e_exact: list[tuple[str, str]] = []
    for t in exact_tables:
        e_exact += [
            (f"{a:012d}", f"{b:012d}")
            for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist())
        ]
    # tiers 2+3 share ONE signature pass (sign once, verify twice)
    sigs = doc_signatures(sf_dir, cfg).materialize()
    # tier 2: MinHash verified edges
    et = _minhash_edge_table(sf_dir, cfg, sigs)
    e_mh: list[tuple[str, str]] = [] if et is None else [
        (f"{a:012d}", f"{b:012d}")
        for a, b in zip(et["a"].to_pylist(), et["b"].to_pylist())
    ]
    # tier 3: SimHash verified pairs
    sp = simhash_near_pairs(sf_dir, max_hamming, cfg, sigs)
    e_sh = [(f"{a:012d}", f"{b:012d}") for a, b in zip(sp["a"], sp["b"])]
    edges = e_exact + e_mh + e_sh
    comp = connected_components(edges) if edges else {}
    _DOC_NEARDUP_CACHE.clear()
    _DOC_NEARDUP_CACHE[memo_key] = (e_exact, e_mh, e_sh, comp)
    return e_exact, e_mh, e_sh, comp


def doc_neardup_clusters(
    sf_dir: str, cfg: DedupConfig | None = None, max_hamming: int = 3
) -> pd.DataFrame:
    """The DOCUMENT flagship — multi-tier near-dup clustering composing all
    three detector families over one edge set, mirroring the image
    pipeline's cascade (pipelines/neardup.run_neardup; the reference's
    cascade-then-verify shape, /root/reference/src/main.rs:188-205):

      tier 1  exact text equality   -> star edges to the min member
      tier 2  MinHash est-Jaccard   -> verified band-candidate edges
      tier 3  SimHash hamming <= t  -> verified band-candidate edges

    then ONE union-find over the union of edges: (doc_id, cluster_id),
    cluster_id = min member (D2/D3). A pair caught by any tier lands in the
    same cluster, so the result is strictly coarser than each single-tier
    operator — the corpus-level dedup a user actually wants.

    Scale shape: each tier is its existing fully distributed path (exact
    star edges via one text_hash grouped_runs; MinHash/SimHash via band
    grouped_runs + vectorized verify over ONE shared signature pass); only
    dup-bounded EDGES reach the driver, where components fold once (the
    flagship's edges-only union-find rule, stages/cluster.py). The DuckDB
    oracle reproduces all three edge relations bit-exactly and the same
    CC, so the composed cluster assignment is value-checked end to end."""
    _, _, _, comp = _doc_neardup_state(
        sf_dir, cfg or DedupConfig(), max_hamming
    )
    if not comp:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster_id": pd.Series(dtype="int64")})
    out = sorted((int(k), int(v)) for k, v in comp.items())
    return pd.DataFrame(
        {"doc_id": [a for a, _ in out], "cluster_id": [b for _, b in out]}
    ).astype("int64")


def doc_neardup_report(
    sf_dir: str, cfg: DedupConfig | None = None, max_hamming: int = 3
) -> pd.DataFrame:
    """Aggregate report over the composed document flagship — the analog of
    the image pipeline's DuplicateReport (A1, /root/reference/src/output.rs:
    39-73) with a per-tier edge breakdown: one row (n_docs, clustered_docs,
    n_clusters, exact_edges, minhash_edges, simhash_edges). Distinct edge
    counts per tier (a pair found by two tiers counts in each — the funnel
    view an operator tunes against). Same distributed tiers and driver
    edge fold as doc_neardup_clusters; the DuckDB oracle counts the same
    three DISTINCT edge relations and the same components."""
    cfg = cfg or DedupConfig()
    e_exact, e_mh, e_sh, comp = _doc_neardup_state(sf_dir, cfg, max_hamming)
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    return pd.DataFrame(
        [{
            "n_docs": int(n_docs),
            "clustered_docs": len(comp),
            "n_clusters": len(set(comp.values())),
            "exact_edges": len(set(e_exact)),
            "minhash_edges": len(set(e_mh)),
            "simhash_edges": len(set(e_sh)),
        }]
    ).astype("int64")


def doc_neardup_keep(
    sf_dir: str, cfg: DedupConfig | None = None, max_hamming: int = 3
) -> rd.Dataset:
    """The composed flagship's APPLY step — the surviving corpus after
    collapsing every multi-tier near-dup component to its min-doc_id
    keeper (the reference keeper rule, /root/reference/src/actions.rs:
    21-26, over the doc_neardup_clusters relation): (doc_id, lang,
    source). Completes the document flagship family: detect
    (doc_neardup_clusters), report (doc_neardup_report), apply (this).

    Scale shape: identical to minhash_dedup_keep — the drop set is
    dup-bounded, broadcasts as one sorted int64 array, and each batch
    filters via searchsorted; swap for a hash anti-join at extreme dup
    volume."""
    import ray

    _, _, _, comp = _doc_neardup_state(
        sf_dir, cfg or DedupConfig(), max_hamming
    )
    drop = np.sort(
        np.array(
            [int(k) for k, v in comp.items() if int(k) != int(v)],
            dtype=np.int64,
        )
    )
    ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(d):
            pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
            hit = d[pos] == ids
        else:
            hit = np.zeros(len(ids), bool)
        m = pa.array(~hit)
        return pa.table(
            {"doc_id": b["doc_id"].filter(m),
             "lang": b["lang"].filter(m),
             "source": b["source"].filter(m)}
        )

    return _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        keep, batch_format="pyarrow"
    )
