"""Training-data curation operators over the ``documents`` table:
benchmark decontamination, per-source frequency capping, text
normalization, PII redaction, repetition scoring, sequence packing —
the corpus-preparation staples a pretraining pipeline runs after dedup.

Reference parity: these extend the reference's dedup surface
(/root/reference/src/dedup.rs pipeline stages) with the adjacent curation
steps a user of that tool runs next; each docstring states its scale shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_ray.stages.grouped import grouped_runs, run_starts


def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from dedup_ray.sources.io import read_view

    return read_view(f"{sf_dir}/documents.parquet", columns=columns)


def _token_lists(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(tokens, per_doc_counts) for a batch of texts, fully vectorized.

    Token = maximal run of non-ASCII-whitespace (same split set as
    ``top_terms`` / the oracles' ``[^ \\t\\n\\x0b\\f\\r]+``).
    ``tokens`` is a flat numpy unicode array; ``per_doc_counts[i]`` tokens
    belong to doc i, in order. Arrow's ascii_split_whitespace emits ''
    at string edges; those are masked out with offsets recomputed via a
    cumsum (reduceat misbehaves on empty docs).
    """
    texts = pc.fill_null(texts, "")
    parts = pc.ascii_split_whitespace(texts)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    off = parts.offsets.to_numpy().astype(np.int64)
    vals = parts.values.to_numpy(zero_copy_only=False)
    nonempty = vals != ""
    cm = np.concatenate([[0], np.cumsum(nonempty)])
    counts = cm[off[1:]] - cm[off[:-1]]
    return vals[nonempty].astype("U"), counts


def _shingles(
    tokens: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-token shingle strings (space-joined) that do not cross doc
    boundaries, plus the doc index of each. np.char.add chains are C
    kernels over fixed-width unicode — no per-row Python."""
    noff = np.concatenate([[0], np.cumsum(counts)])
    doc_of = np.repeat(np.arange(len(counts)), counts)
    ti = np.arange(len(tokens))
    if len(tokens) == 0:
        return np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64)
    starts = np.flatnonzero(ti + k <= noff[doc_of + 1])
    if starts.size == 0:
        return np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64)
    sh = tokens[starts]
    for j in range(1, k):
        sh = np.char.add(np.char.add(sh, " "), tokens[starts + j])
    return sh, doc_of[starts]


def decontaminate_docs(
    sf_dir: str, eval_source: str = "src0", k: int = 5
) -> rd.Dataset:
    """Benchmark decontamination: flag training docs sharing any k-token
    shingle with the held-out eval set (here: docs with source ==
    ``eval_source``). Returns (doc_id, n_matched) for contaminated docs,
    n_matched = number of DISTINCT eval shingles the doc contains.

    Scale shape: the eval set is small by nature (a benchmark), so its
    distinct shingle set is built once and broadcast via ray.put; the
    training corpus then streams through ONE map_batches with a vectorized
    np.isin membership probe — no shuffle, no driver materialization of
    the big side. At 100 TB the broadcast set is the only standing state
    (a few GB of eval shingles at worst; swap the raw-string set for a
    64-bit-hash set if the eval corpus ever outgrows worker heaps).
    """
    is_eval = pc.equal  # alias to keep lambdas short

    def eval_partial(b: pa.Table) -> pa.Table:
        t = b.filter(is_eval(b["source"], eval_source))
        toks, cnt = _token_lists(t["text"])
        sh, _ = _shingles(toks, cnt, k)
        return pa.table({"s": pa.array(np.unique(sh))})

    ev_parts = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(eval_partial, batch_format="pyarrow")
        .take_all()
    )  # eval shingles only — small by construction
    ev = np.unique(np.asarray([r["s"] for r in ev_parts], dtype="U"))
    ev_ref = ray.put(ev)

    def probe(b: pa.Table) -> pa.Table:
        ev_set = ray.get(ev_ref)
        t = b.filter(pc.invert(is_eval(b["source"], eval_source)))
        toks, cnt = _token_lists(t["text"])
        sh, doc_of = _shingles(toks, cnt, k)
        hit = np.isin(sh, ev_set)
        if not hit.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_matched": pa.array([], pa.int64())}
            )
        d, s = doc_of[hit], sh[hit]
        # distinct matched shingles per doc (a doc is one row => one batch,
        # so within-batch distinct is global distinct)
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        uniq_d = d[new]
        starts = run_starts(uniq_d)
        bounds = np.concatenate([starts, [len(uniq_d)]])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[uniq_d[starts]], type=pa.int64()),
                "n_matched": pa.array(np.diff(bounds), type=pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        probe, batch_format="pyarrow"
    )


def cap_per_source(sf_dir: str, cap: int = 5) -> rd.Dataset:
    """Per-source frequency capping (hot-domain downsampling): keep the
    first ``cap`` docs of each source by doc_id, with their rank.
    ONE coarse hash shuffle on source via grouped_runs; ranks computed
    with a vectorized arange-minus-run-start. Returns (source, doc_id, rnk).
    """

    def keep_first(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import run_ranks

        rnk = run_ranks(g["source"].to_numpy(zero_copy_only=False)) + 1
        keep = rnk <= cap
        g = g.append_column("rnk", pa.array(rnk, type=pa.int64()))
        return g.filter(pa.array(keep))

    return grouped_runs(
        _docs(sf_dir, ["source", "doc_id"]),
        "source",
        keep_first,
        sort_cols=["source", "doc_id"],
    )


def normalize_text(sf_dir: str) -> rd.Dataset:
    """Text normalization: lowercase, collapse whitespace runs to one
    space, trim. Three RE2/Arrow kernels per batch, zero per-row Python,
    no shuffle. Returns (doc_id, norm_text)."""

    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.fill_null(b["text"], ""))
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim(t, " ")
        return pa.table({"doc_id": b["doc_id"], "norm_text": t})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(norm, batch_format="pyarrow")


# RE2 on both sides (Arrow and DuckDB link the same regex engine), so the
# redaction is bit-identical to the oracle. Emails first: a digit-heavy
# local part must not be half-eaten by the phone pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_redact(sf_dir: str) -> rd.Dataset:
    """PII scrubbing: emails -> <EMAIL>, then phone-shaped digit runs ->
    <PHONE>. Returns (doc_id, clean_text, n_redactions). Pure map stage —
    at 100 TB this is the canonical embarrassingly-parallel transform."""

    def scrub(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b["text"], "")
        n_email = pc.count_substring_regex(t, EMAIL_RE)
        t = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
        n_phone = pc.count_substring_regex(t, PHONE_RE)
        t = pc.replace_substring_regex(t, PHONE_RE, "<PHONE>")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "clean_text": t,
                "n_redactions": pc.add(n_email, n_phone).cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scrub, batch_format="pyarrow")


def dup_bigram_fraction(sf_dir: str) -> rd.Dataset:
    """Repetition quality signal (Gopher-style): per doc, the fraction of
    token bigrams that are repeats = 1 - distinct/total (0.0 when a doc
    has < 2 tokens). Vectorized per batch: shingle strings via np.char,
    per-doc distinct via one lexsort; no shuffle.
    Returns (doc_id, n_bigrams, dup_frac)."""

    def score(b: pa.Table) -> pa.Table:
        toks, cnt = _token_lists(b["text"])
        sh, doc_of = _shingles(toks, cnt, 2)
        ndocs = len(cnt)
        total = np.maximum(cnt - 1, 0)
        distinct = np.zeros(ndocs, dtype=np.int64)
        if sh.size:
            order = np.lexsort((sh, doc_of))
            d, s = doc_of[order], sh[order]
            new = np.ones(len(d), dtype=bool)
            new[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
            np.add.at(distinct, d[new], 1)
        frac = np.zeros(ndocs, dtype=np.float64)
        nz = total > 0
        # same int/int -> float64 IEEE ops as the DuckDB oracle
        frac[nz] = 1.0 - distinct[nz] / total[nz]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": pa.array(total, type=pa.int64()),
                "dup_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


def pack_sequences(
    sf_dir: str, budget: int = 256, num_parts: int = 8
) -> rd.Dataset:
    """Sequence packing for pretraining: greedily pack docs into bins of at
    most ``budget`` tokens (a doc alone larger than the budget gets its own
    bin). Packing is inherently sequential, so it is PARTITION-LOCAL:
    docs are routed to ``doc_id % num_parts`` partitions, packed in doc_id
    order within each, and bins are namespaced ``part * 1_000_000 + local``
    — deterministic for a given num_parts, and each partition packs
    independently at cluster scale. Only (doc_id, n_tokens) rows shuffle;
    text never moves. The per-partition loop is O(#bins) searchsorted
    steps over a cumsum, not O(#docs) Python.
    Returns (doc_id, part, bin_id, n_tokens)."""

    def count_tokens(b: pa.Table) -> pa.Table:
        toks = pc.fill_null(pc.count_substring_regex(b["text"], r"\S+"), 0)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "part": pa.array(ids % num_parts, type=pa.int64()),
                "n_tokens": toks.cast(pa.int64()),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        part = g["part"].to_numpy(zero_copy_only=False)
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        bin_id = np.empty(len(part), dtype=np.int64)
        bounds = np.concatenate([run_starts(part), [len(part)]])
        for r in range(len(bounds) - 1):
            lo, hi = bounds[r], bounds[r + 1]
            cum = np.cumsum(ntok[lo:hi])
            base = np.int64(part[lo]) * 1_000_000
            start, local = 0, 0
            offset = 0.0
            while start < hi - lo:
                # largest j with cum[j-1] - offset <= budget; at least one doc
                j = int(np.searchsorted(cum, offset + budget, side="right"))
                j = max(j, start + 1)
                bin_id[lo + start : lo + j] = base + local
                offset = cum[j - 1]
                start, local = j, local + 1
        return g.append_column("bin_id", pa.array(bin_id, type=pa.int64()))

    sized = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow"
    )
    return grouped_runs(
        sized, "part", pack, sort_cols=["part", "doc_id"]
    ).select_columns(["doc_id", "part", "bin_id", "n_tokens"])


# exact integer thresholds for the 90/5/5 split: float(0.9 * 2**64) is not
# representable, so both sides (numpy and the DuckDB oracle) compare against
# the SAME integer constants
_SPLIT_T1 = (1 << 64) * 9 // 10
_SPLIT_T2 = (1 << 64) * 19 // 20


def hash_split_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test split (90/5/5) by splitmix64(doc_id):
    (doc_id, split). The pretraining staple for leakage-free held-out sets —
    membership is a pure function of the id, so it is stable across runs,
    machines and re-shards, and any later pipeline can recompute it instead
    of joining against a stored assignment.

    Scale shape: a pure projection-pruned map over one int64 column — no
    shuffle, no state, no driver materialization; at 10^12 rows it is one
    streamed pass. The DuckDB oracle reproduces splitmix64 bit-exactly in
    HUGEINT arithmetic, so the assignment itself is value-checked."""
    from dedup_ray.functions.hashing import splitmix64

    t1, t2 = np.uint64(_SPLIT_T1), np.uint64(_SPLIT_T2)

    def assign(b: pa.Table) -> pa.Table:
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False))
        split = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
        return pa.table({"doc_id": b["doc_id"], "split": pa.array(split)})

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


def sample_per_source(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Deterministic uniform sample of ``k`` docs per source, ranked by
    splitmix64(doc_id): (source, doc_id). Reproducible subsampling for
    inspection / eval-set carving without a stored seed or a global sort.

    Scale shape: same two-level top-k as ``analysis.top_docs_per_lang`` —
    a vectorized per-batch local top-k prunes to <= k rows per (source,
    batch) BEFORE the one grouped_runs ranking shuffle, so data moved is
    O(k * sources * batches), independent of corpus size."""
    from dedup_ray.functions.hashing import splitmix64

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b,
            sort_keys=[("source", "ascending"), ("h", "ascending"),
                       ("doc_id", "ascending")],
        )
        b = b.take(idx)
        from dedup_ray.stages.grouped import run_ranks

        rank = run_ranks(b["source"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(rank < k))

    def add_h(b: pa.Table) -> pa.Table:
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False))
        return b.append_column("h", pa.array(h, type=pa.uint64()))

    ds = (
        _docs(sf_dir, columns=["doc_id", "source"])
        .map_batches(add_h, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
    )
    # local_topk re-sorts its (pruned) input fully, so it is also the merge
    # kernel for the bucket pass
    out = grouped_runs(ds, "source", local_topk)
    return out.select_columns(["source", "doc_id"])


def dup_ngrams(sf_dir: str, k: int = 8) -> rd.Dataset:
    """Corpus-level duplicated-passage detection (the signal behind
    suffix-array substring dedup, Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): every k-token shingle that occurs
    in >= 2 DISTINCT documents, with its document frequency:
    (shingle, n_docs). Downstream curation drops or trims the spans.

    Scale shape: each batch emits distinct (shingle, doc) pairs reduced to
    per-shingle partial counts (a doc's shingles never cross batches, so
    in-batch dedup is exact), then ONE grouped_runs merge sums partials and
    applies HAVING >= 2 inside the bucket kernel — only (shingle, count)
    rows shuffle, never documents. At 10^12 docs the string shuffle key
    would swap for the 64-bit shingle hash (collision-checked), with
    strings fetched only for the tiny surviving dup set; strings are kept
    here so the DuckDB oracle can value-check the full output."""

    def partial(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import distinct_pairs

        toks, counts = _token_lists(b["text"])
        sh, doc_of = _shingles(toks, counts, k)
        sh, _ = distinct_pairs(sh, doc_of)
        # sh is already sorted (distinct_pairs sorts by key first):
        # run-length counting beats np.unique's redundant string re-sort
        starts = run_starts(sh)
        c = np.diff(np.append(starts, len(sh)))
        return pa.table(
            {"shingle": pa.array(sh[starts].astype(object), type=pa.string()),
             "n": pa.array(c, type=pa.int64())}
        )

    def merge(t: pa.Table) -> pa.Table:
        sh = t["shingle"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        starts = run_starts(sh)
        if starts.size == 0:
            return pa.table(
                {"shingle": pa.array([], type=pa.string()),
                 "n_docs": pa.array([], type=pa.int64())}
            )
        tot = np.add.reduceat(n, starts)
        keep = tot >= 2
        return pa.table(
            {"shingle": pa.array(sh[starts][keep], type=pa.string()),
             "n_docs": pa.array(tot[keep], type=pa.int64())}
        )

    parts = _docs(sf_dir, columns=["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_runs(parts, "shingle", merge)


def mix_sources(sf_dir: str) -> rd.Dataset:
    """Deterministic per-source downsampling (data mixing): each source gets
    an acceptance weight and a doc survives iff splitmix64(doc_id) falls
    under weight * 2^64 — the standard way a pretraining pipeline rebalances
    source proportions (e.g. downweight crawl, keep curated sources whole)
    without a stored sample or a shuffle: (doc_id, source).

    Weights here cycle 0.25 / 0.50 / 0.75 / 1.00 by the source's integer
    suffix (a stand-in for a config dict; thresholds are EXACT multiples of
    2^62, so the DuckDB oracle compares against the same integers).
    Membership composes with hash_split_docs (independent bits of the same
    hash family would need distinct stream constants; here the mix uses the
    same splitmix64, documented).

    Scale shape: a pure projection-pruned map over (doc_id, source) — no
    shuffle, no state; at 10^12 rows one streamed pass, like hash_split_docs.
    """
    from dedup_ray.functions.hashing import splitmix64

    def keep_mask(b: pa.Table) -> pa.Table:
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False))
        suffix = pc.cast(pc.utf8_slice_codeunits(b["source"], 3, 99), pa.int64())
        wq = (suffix.to_numpy(zero_copy_only=False) % 4 + 1).astype(np.uint64)
        keep = wq == 4  # weight 1.0: always kept ((4 << 62) wraps to 0)
        keep |= h < (wq << np.uint64(62))
        return b.filter(pa.array(keep))

    return _docs(sf_dir, columns=["doc_id", "source"]).map_batches(
        keep_mask, batch_format="pyarrow"
    )


def remove_dup_passages(sf_dir: str, k: int = 8) -> rd.Dataset:
    """Duplicated-passage REMOVAL — the apply step of substring dedup (Lee
    et al. 2022): every token covered by a k-token shingle that occurs in
    >= 2 distinct documents is dropped from every doc EXCEPT the shingle's
    keeper (min doc_id); text is rebuilt from the surviving tokens:
    (doc_id, clean_text, n_removed). Complements ``dup_ngrams`` (the detect
    step) the way the reference's hardlink action complements its report
    (/root/reference/src/actions.rs:35-115 — detect, then mutate).

    Scale shape: pass 1 is dup_ngrams' shuffle extended with a per-shingle
    min-doc (keeper) — only (shingle, count, min_doc) partials move; the
    surviving dup set is small by construction (it IS the duplication) and
    broadcasts via ray.put as sorted arrays; pass 2 re-streams the corpus
    once, probes shingle membership with searchsorted, marks covered token
    spans with a vectorized diff-array, and rebuilds text with ONE Arrow
    binary_join per batch — no per-row Python anywhere. If the dup set ever
    outgrew worker heaps, pass 2's probe becomes a shuffle join on the
    shingle hash (same grouped_runs machinery), with text rebuild after a
    regroup by doc."""
    import ray

    from dedup_ray.stages.grouped import distinct_pairs

    def partial(b: pa.Table) -> pa.Table:
        toks, counts = _token_lists(b["text"])
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sh, doc_of = _shingles(toks, counts, k)
        sh, docs = distinct_pairs(sh, doc_ids[doc_of])
        starts = run_starts(sh)
        if starts.size == 0:
            return pa.table(
                {"shingle": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64()),
                 "mdoc": pa.array([], type=pa.int64())}
            )
        bounds = np.append(starts, len(sh))
        return pa.table(
            {
                "shingle": pa.array(sh[starts].astype(object), type=pa.string()),
                "n": pa.array(np.diff(bounds), type=pa.int64()),
                # docs within a run are sorted by distinct_pairs: min = first
                "mdoc": pa.array(docs[starts], type=pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        sh = t["shingle"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        md = t["mdoc"].to_numpy(zero_copy_only=False)
        starts = run_starts(sh)
        empty = pa.table(
            {"shingle": pa.array([], type=pa.string()),
             "keeper": pa.array([], type=pa.int64())}
        )
        if starts.size == 0:
            return empty
        tot = np.add.reduceat(n, starts)
        keeper = np.minimum.reduceat(md, starts)
        keep = tot >= 2
        return pa.table(
            {"shingle": pa.array(sh[starts][keep], type=pa.string()),
             "keeper": pa.array(keeper[keep], type=pa.int64())}
        )

    dup = grouped_runs(
        _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "shingle",
        merge,
    )
    tabs = [
        t for t in ray.get(dup.to_arrow_refs())
        if t.num_rows and "shingle" in t.column_names
    ]
    if tabs:
        cat = pa.concat_tables(tabs)
        dsh = cat["shingle"].to_numpy(zero_copy_only=False).astype("U")
        dkp = cat["keeper"].to_numpy(zero_copy_only=False)
        order = np.argsort(dsh, kind="stable")
        dsh, dkp = dsh[order], dkp[order]
    else:
        dsh, dkp = np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64)
    ref = ray.put((dsh, dkp))

    def rewrite(b: pa.Table) -> pa.Table:
        dup_sh, dup_keep = ray.get(ref)
        toks, counts = _token_lists(b["text"])
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        noff = np.concatenate([[0], np.cumsum(counts)])
        removed = np.zeros(len(toks) + 1, dtype=np.int64)  # diff array
        if dup_sh.size:
            sh, starts_flat = _shingles_with_pos(toks, counts, k)
            if sh.size:
                pos = np.searchsorted(dup_sh, sh)
                pos[pos >= dup_sh.size] = dup_sh.size - 1
                hit = dup_sh[pos] == sh
                # drop occurrences in the shingle's keeper doc
                doc_of = np.searchsorted(noff, starts_flat, side="right") - 1
                hit &= dup_keep[pos] != doc_ids[doc_of]
                hs = starts_flat[hit]
                np.add.at(removed, hs, 1)
                np.add.at(removed, hs + k, -1)  # in-doc: spans can't cross docs
        covered = np.cumsum(removed[:-1]) > 0
        kept = ~covered
        if len(toks):
            # reduceat needs indices < len: clip trailing-empty-doc starts
            # (their value is overridden by the counts==0 mask anyway)
            idx = np.minimum(noff[:-1], len(toks) - 1)
            # int64 cast is LOAD-BEARING: add.reduceat over bools ORs, not sums
            new_counts = np.add.reduceat(kept.astype(np.int64), idx)
        else:
            new_counts = np.zeros(len(counts), dtype=np.int64)
        new_counts = np.where(counts == 0, 0, new_counts)  # reduceat quirk on empty docs
        new_off = np.concatenate([[0], np.cumsum(new_counts)])
        lists = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()),
            pa.array(toks[kept].astype(object), type=pa.string()),
        )
        clean = pc.binary_join(lists, " ")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "clean_text": clean,
                "n_removed": pa.array(
                    counts - new_counts, type=pa.int64()
                ),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        rewrite, batch_format="pyarrow"
    )


def _shingles_with_pos(
    tokens: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Like _shingles but returns (shingle, FLAT token start index) — the
    rewrite step needs positions, not just doc ids."""
    noff = np.concatenate([[0], np.cumsum(counts)])
    doc_of = np.repeat(np.arange(len(counts)), counts)
    ti = np.arange(len(tokens))
    if len(tokens) == 0:
        return np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64)
    starts = np.flatnonzero(ti + k <= noff[doc_of + 1])
    if starts.size == 0:
        return np.empty(0, dtype="U1"), np.empty(0, dtype=np.int64)
    sh = tokens[starts]
    for j in range(1, k):
        sh = np.char.add(np.char.add(sh, " "), tokens[starts + j])
    return sh, starts


def curate_docs(
    sf_dir: str, min_tokens: int = 20, q_lo: float = 0.05, q_hi: float = 0.95
) -> rd.Dataset:
    """The composed text-curation pipeline — dedup + outlier trim + quality
    floor in ONE pass, the text-side analog of the image flagship's staged
    cascade: a doc survives iff it is (a) the keeper (min doc_id) of its
    exact-text group, (b) inside the corpus's [p05, p95] length band and
    (c) at least ``min_tokens`` tokens long: (doc_id).

    Scale shape: thresholds come from the bounded value histogram
    (collect_value_hist); per-row stats (hash, token count) compute on the
    scan; then ONE grouped_runs on the text hash both picks each group's
    keeper AND applies the row filters inside the bucket kernel — only
    (hash, doc_id, n_chars, n_tokens) rows shuffle, never text. Conditions
    (b)/(c) commute with (a) because they depend on columns constant within
    an exact-text group — so filtering at the keeper step equals filtering
    before or after it (the cascade-reordering argument)."""
    import hashlib

    from dedup_ray.stages.grouped import (
        collect_value_hist,
        grouped_runs,
        quantiles_from_hist,
        run_starts,
    )

    v, n = collect_value_hist(_docs(sf_dir, columns=["n_chars"]), "n_chars")
    if v.size == 0:
        return rd.from_arrow(pa.schema([("doc_id", pa.int64())]).empty_table())
    lo, hi = quantiles_from_hist(v, n, (q_lo, q_hi))

    def keys(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b["text"], "")
        toks = pc.fill_null(pc.count_substring_regex(texts, r"\S+"), 0)
        th = [
            hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
            for t in texts.to_pylist()
        ]
        return pa.table(
            {
                "th": pa.array(th, type=pa.string()),
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "n_tokens": toks.cast(pa.int64()),
            }
        )

    def keep_runs(g: pa.Table) -> pa.Table:
        th = np.asarray(g["th"].to_pylist(), dtype=object)
        if len(th) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        starts = run_starts(th)  # sorted by (th, doc_id): run head = keeper
        keeper = g.take(pa.array(starts, type=pa.int64()))
        nc = keeper["n_chars"].to_numpy(zero_copy_only=False)
        nt = keeper["n_tokens"].to_numpy(zero_copy_only=False)
        keep = (nc >= lo) & (nc <= hi) & (nt >= min_tokens)
        return pa.table({"doc_id": keeper["doc_id"].filter(pa.array(keep))})

    keyed = _docs(sf_dir, columns=["doc_id", "text", "n_chars"]).map_batches(
        keys, batch_format="pyarrow"
    )
    return grouped_runs(keyed, "th", keep_runs, sort_cols=["th", "doc_id"])


def diff_snapshots(sf_dir: str) -> rd.Dataset:
    """Dataset DIFF between two corpus snapshots — the curation-iteration
    audit step ("what did this pipeline change?"): (doc_id, status) with
    status in added / removed / changed; unchanged rows are suppressed.

    The "new" snapshot is derived deterministically from ``documents`` so
    both engines reconstruct it identically: doc_id % 13 == 0 rows are
    dropped (removed), doc_id % 11 == 0 survivors get ' [v2]' appended
    (changed), and each doc_id % 17 == 0 row also spawns a fresh row at
    doc_id + 1_000_000 (added).

    Scale shape: both snapshots are tagged 0/1 and unioned, then ONE coarse
    hash shuffle on doc_id co-locates each key's (≤2) rows; the bucket
    kernel classifies runs with two vectorized masks and an object-array
    text compare on the both-sides runs only. Nothing broadcasts, nothing
    materializes — the diff of two 100 TB snapshots moves each side once.
    Oracle: FULL OUTER JOIN o/n ON doc_id with NULL/inequality cases."""

    def make_old(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"], "text": b["text"],
             "side": pa.array(np.zeros(b.num_rows, np.int8))}
        )

    def make_new(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = b["text"].to_numpy(zero_copy_only=False)
        keep = did % 13 != 0
        kd, kt = did[keep], txt[keep]
        changed = kd % 11 == 0
        kt = np.where(changed, np.char.add(kt.astype(str), " [v2]"), kt)
        add_src = did[did % 17 == 0]
        out_id = np.concatenate([kd, add_src + 1_000_000])
        out_tx = np.concatenate(
            [kt, np.char.add("new doc ", add_src.astype(str))]
        )
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "text": pa.array(out_tx, pa.string()),
             "side": pa.array(np.ones(len(out_id), np.int8))}
        )

    cols = ["doc_id", "text"]
    old = _docs(sf_dir, columns=cols).map_batches(make_old, batch_format="pyarrow")
    new = _docs(sf_dir, columns=cols).map_batches(make_new, batch_format="pyarrow")

    def diff_runs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "status": pa.array([], pa.string())}
            )
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        txt = g["text"].to_numpy(zero_copy_only=False)
        starts = run_starts(did)
        lens = np.diff(np.append(starts, n))
        out_id, out_st = [], []
        one = lens == 1
        # singletons: side decides added/removed (sorted by [doc_id, side])
        s1 = starts[one]
        out_id.append(did[s1])
        out_st.append(np.where(side[s1] == 0, "removed", "added"))
        # pairs: changed iff text differs (equal rows are suppressed)
        s2 = starts[~one]
        if s2.size:
            diffm = txt[s2] != txt[s2 + 1]
            out_id.append(did[s2[diffm]])
            out_st.append(np.full(int(diffm.sum()), "changed", dtype=object))
        ids = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        sts = np.concatenate(out_st) if out_st else np.empty(0, object)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "status": pa.array(sts.astype(object), pa.string())}
        )

    return grouped_runs(
        old.union(new), "doc_id", diff_runs, sort_cols=["doc_id", "side"]
    )


def source_dedup_stats(sf_dir: str) -> rd.Dataset:
    """Per-source duplication health report — the curation dashboard's
    first row: (source, n_rows, n_distinct, distinct_ratio) where
    distinct_ratio = n_distinct / n_rows (one IEEE division of exact ints,
    bit-identical on both engines).

    Combiner shape: each batch collapses to its distinct (source, text)
    pairs plus a per-source row-count partial, so the full stream never
    shuffles; ONE coarse hash shuffle on source, then run counts. The
    distinct pairs carry the text once (needed for cross-batch distinct);
    at 100 TB you'd collapse text to a 128-bit digest in the combiner
    first — same shape, digest instead of payload (the documented swap,
    cf. exact text dedup's text_hash)."""

    def pair_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"], "text": b["text"]})
        d = t.group_by(["source", "text"]).aggregate([("text", "count")])
        return d.rename_columns(["source", "text", "n"])

    pairs = _docs(sf_dir, columns=["source", "text"]).map_batches(
        pair_partial, batch_format="pyarrow"
    )

    def stats_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "n_rows": pa.array([], pa.int64()),
                 "n_distinct": pa.array([], pa.int64()),
                 "distinct_ratio": pa.array([], pa.float64())}
            )
        s = g["source"].to_numpy(zero_copy_only=False)
        txt = g["text"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = run_starts(s)
        bounds = np.append(starts, len(s))
        # distinct (source, text) pairs across batches: new-pair mask
        new_pair = np.ones(len(s), dtype=bool)
        new_pair[1:] = (s[1:] != s[:-1]) | (txt[1:] != txt[:-1])
        cm_d = np.concatenate([[0], np.cumsum(new_pair)])
        cm_n = np.concatenate([[0], np.cumsum(n)])
        n_rows = cm_n[bounds[1:]] - cm_n[bounds[:-1]]
        n_dist = cm_d[bounds[1:]] - cm_d[bounds[:-1]]
        return pa.table(
            {"source": pa.array(s[starts]),
             "n_rows": pa.array(n_rows, pa.int64()),
             "n_distinct": pa.array(n_dist, pa.int64()),
             "distinct_ratio": pa.array(
                 n_dist.astype(np.float64) / n_rows.astype(np.float64),
                 pa.float64())}
        )

    return grouped_runs(
        pairs, "source", stats_runs, sort_cols=["source", "text"]
    )


def interleave_sources(sf_dir: str) -> rd.Dataset:
    """Deterministic round-robin source interleaving — the training-data
    ORDERING primitive: (doc_id, source, rr_pos) where rr_pos lays the
    corpus out as source0[0], source1[0], ..., source0[1], source1[1], ...
    so a sequential reader sees sources evenly mixed without a global
    shuffle. rr_pos = rank_within_source * n_sources + source_index, all
    deterministic (rank ordered by doc_id, sources ordered by name).

    ONE source shuffle assigns within-source ranks (run-local arange —
    no per-group Python); the source domain is bounded, so the
    source→index map comes from a tiny per-batch distinct pre-pass merged
    on the driver and broadcast in the kernel closure."""
    docs = _docs(sf_dir, ["doc_id", "source"])

    def distinct_sources(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"].unique()})

    parts = [
        t for t in ray.get(
            docs.map_batches(distinct_sources, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "source" in t.column_names
    ]
    schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("rr_pos", pa.int64())]
    )
    if not parts:
        return rd.from_arrow(schema.empty_table())
    names = sorted(set(pa.concat_tables(parts)["source"].to_pylist()))
    src_idx = {s: i for i, s in enumerate(names)}
    n_src = len(names)

    def rank_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        starts = run_starts(src)
        lens = np.diff(np.append(starts, len(src)))
        rank = np.arange(len(src), dtype=np.int64) - np.repeat(starts, lens)
        si = np.fromiter((src_idx[s] for s in src), dtype=np.int64,
                         count=len(src))
        return pa.table(
            {"doc_id": g["doc_id"], "source": g["source"],
             "rr_pos": pa.array(rank * n_src + si, type=pa.int64())}
        )

    return grouped_runs(docs, "source", rank_runs,
                        sort_cols=["source", "doc_id"])


def stratified_split_docs(sf_dir: str) -> rd.Dataset:
    """Stratified train/val split with EXACT per-stratum proportions:
    within every (lang, source) stratum, the ceil(10%) docs with the
    smallest splitmix64(doc_id) go to 'val' — (doc_id, split). Unlike
    hash_split_docs (global expected proportions), every stratum lands its
    quota exactly, so rare (lang, source) cells are never starved out of
    the held-out set.

    ONE stratum shuffle; the bucket kernel ranks run-locally (arange minus
    repeated run starts — no per-group Python); the val quota is the
    all-integer (n + 9) // 10, shared verbatim with the oracle so no float
    ceil can flip a boundary row."""
    from dedup_ray.functions.hashing import splitmix64

    def add_keys(b: pa.Table) -> pa.Table:
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False))
        strat = pc.binary_join_element_wise(b["lang"], b["source"], "\x1f")
        return pa.table(
            {"doc_id": b["doc_id"], "stratum": strat,
             "h": pa.array(h, type=pa.uint64())}
        )

    ds = _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        add_keys, batch_format="pyarrow"
    )
    schema = pa.schema([("doc_id", pa.int64()), ("split", pa.string())])

    def split_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        strat = np.asarray(g["stratum"].to_pylist(), dtype=object)
        starts = run_starts(strat)
        lens = np.diff(np.append(starts, len(strat)))
        rank = np.arange(len(strat), dtype=np.int64) - np.repeat(starts, lens)
        quota = np.repeat((lens + 9) // 10, lens)
        split = np.where(rank < quota, "val", "train")
        return pa.table({"doc_id": g["doc_id"], "split": pa.array(split)})

    return grouped_runs(ds, "stratum", split_runs,
                        sort_cols=["stratum", "h", "doc_id"])


def chunk_docs(
    sf_dir: str, size: int = 200, step: int = 150
) -> rd.Dataset:
    """Overlapping document chunking — the context-window preparation
    staple: (doc_id, chunk_idx, chunk_text) where chunk i covers characters
    [i*step, i*step + size); every doc emits at least one chunk. The
    row-EXPANDING map shape (flat_map): output rows are bounded by total
    corpus characters / step, and each batch expands independently inside
    one streamed map — no shuffle, no state. The chunk count formula is
    all-integer ((L - size + step - 1) // step + 1) and shared with the
    oracle, so boundary docs split identically."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    schema = pa.schema(
        [("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
         ("chunk_text", pa.string())]
    )

    def expand(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_txt = [], [], []
        for did, t in zip(ids, texts):
            t = t or ""
            ln = len(t)
            n = 1 if ln <= size else (ln - size + step - 1) // step + 1
            for i in range(n):  # O(output chars); slice is one C memcpy
                out_id.append(did)
                out_idx.append(i)
                out_txt.append(t[i * step: i * step + size])
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "chunk_idx": pa.array(out_idx, pa.int64()),
             "chunk_text": pa.array(out_txt, pa.string())}
        ) if out_id else schema.empty_table()

    return docs.map_batches(expand, batch_format="pyarrow")


def above_avg_sources(sf_dir: str) -> rd.Dataset:
    """Sources whose mean document length beats the corpus mean:
    (source, n_docs, total_chars) — nested-aggregate HAVING. Per-batch
    (source, count, sum) partials, one tiny source groupby; the comparison
    is the EXACT integer cross-multiplication sum_s * N > total * n_s, so
    no float average can flip a boundary source (same trick as
    above_avg_orders)."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"], "n_chars": b["n_chars"]})
        g = t.group_by("source").aggregate(
            [("n_chars", "sum"),
             ("n_chars", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"source": g["source"], "ps": g["n_chars_sum"].cast(pa.int64()),
             "pn": g["n_chars_count"].cast(pa.int64())}
        )

    agg = (
        _docs(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["ps", "pn"])
    )
    schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("total_chars", pa.int64())]
    )

    def having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(ps)" not in b.column_names:
            return schema.empty_table()
        s = b["sum(ps)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = b["sum(pn)"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        total, big_n = int(s.sum()), int(n.sum())
        keep = pa.array(s.astype(object) * big_n > total * n.astype(object))
        return pa.table(
            {"source": b["source"].filter(keep),
             "n_docs": pa.array(n[np.asarray(keep)], pa.int64()),
             "total_chars": pa.array(s[np.asarray(keep)], pa.int64())}
        )

    return agg.repartition(1).map_batches(
        having, batch_format="pyarrow", batch_size=None
    )


def pii_stats(sf_dir: str) -> rd.Dataset:
    """PII EXTRACTION census — the audit complement of pii_redact: per
    source, how many documents contain any email / phone-shaped PII and
    the total hit counts: (source, n_docs, docs_with_pii, n_emails,
    n_phones). Drives the keep/redact/drop policy decision before a
    release. Per-batch RE2 counts aggregate to (source,) partials; one
    tiny source groupby merges."""

    def partial(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b["text"], "")
        ne = pc.count_substring_regex(t, EMAIL_RE).cast(pa.int64())
        np_ = pc.count_substring_regex(t, PHONE_RE).cast(pa.int64())
        has = pc.or_(pc.greater(ne, 0), pc.greater(np_, 0)).cast(pa.int64())
        tt = pa.table(
            {"source": b["source"], "one": pa.array(np.ones(b.num_rows, np.int64)),
             "has": has, "ne": ne, "np": np_}
        )
        g = tt.group_by("source").aggregate(
            [("one", "sum"), ("has", "sum"), ("ne", "sum"), ("np", "sum")]
        )
        return pa.table(
            {"source": g["source"], "pd": g["one_sum"].cast(pa.int64()),
             "ph": g["has_sum"].cast(pa.int64()),
             "pe": g["ne_sum"].cast(pa.int64()),
             "pp": g["np_sum"].cast(pa.int64())}
        )

    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["pd", "ph", "pe", "pp"])
    )
    schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("docs_with_pii", pa.int64()), ("n_emails", pa.int64()),
         ("n_phones", pa.int64())]
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pd)" not in b.column_names:
            return schema.empty_table()
        return pa.table(
            {"source": b["source"], "n_docs": b["sum(pd)"].cast(pa.int64()),
             "docs_with_pii": b["sum(ph)"].cast(pa.int64()),
             "n_emails": b["sum(pe)"].cast(pa.int64()),
             "n_phones": b["sum(pp)"].cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def proportional_sample(sf_dir: str, total: int = 100) -> rd.Dataset:
    """EXACT proportional stratified sample: ``total`` docs allocated
    across sources by largest-remainder apportionment (quota_s =
    total*n_s//N plus one extra for the largest remainders until the
    total is exact), each source contributing its quota of smallest-
    splitmix64 docs: (source, doc_id). Unlike sample_per_source (fixed k)
    or mix_sources (expected proportions), the output size and per-source
    allocation are both exact — the data-mixing recipe executor.

    Source counts are a bounded driver-side pre-pass; the sample selection
    is the same local-topk-prune + one grouped_runs ranking pass as
    sample_per_source, with per-source quotas broadcast in the closure.
    All apportionment arithmetic is integer, shared with the oracle."""
    from dedup_ray.functions.hashing import splitmix64
    from dedup_ray.stages.grouped import run_ranks

    def count_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"]})
        g = t.group_by("source").aggregate(
            [("source", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["source", "pn"])

    docs = _docs(sf_dir, columns=["doc_id", "source"])
    parts = [
        t for t in ray.get(
            docs.map_batches(count_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "source" in t.column_names
    ]
    schema = pa.schema([("source", pa.string()), ("doc_id", pa.int64())])
    if not parts:
        return rd.from_arrow(schema.empty_table())
    cnt = (
        pa.concat_tables(parts).group_by("source").aggregate([("pn", "sum")])
        .to_pandas()
    )
    n = cnt["pn_sum"].to_numpy(np.int64)
    tot = int(n.sum())
    if tot == 0:
        return rd.from_arrow(schema.empty_table())
    base = (total * n) // tot
    rem = (total * n) % tot
    # largest remainder, tie broken by source name (matches the oracle)
    order = sorted(range(len(cnt)),
                   key=lambda i: (-int(rem[i]), cnt["source"].iloc[i]))
    extra = max(0, min(total - int(base.sum()), len(cnt)))
    quota = base.copy()
    for i in order[:extra]:
        quota[i] += 1
    quotas = dict(zip(cnt["source"], (int(q) for q in quota)))

    def add_h(b: pa.Table) -> pa.Table:
        h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False))
        return b.append_column("h", pa.array(h, type=pa.uint64()))

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("source", "ascending"), ("h", "ascending"),
                          ("doc_id", "ascending")],
        )
        b = b.take(idx)
        rank = run_ranks(b["source"].to_numpy(zero_copy_only=False))
        kk = np.fromiter(
            (quotas.get(s, 0) for s in b["source"].to_pylist()),
            dtype=np.int64, count=b.num_rows,
        )
        return b.filter(pa.array(rank < kk))

    ds = (
        docs.map_batches(add_h, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
    )
    out = grouped_runs(ds, "source", local_topk)
    return out.select_columns(["source", "doc_id"])


def remove_rare_tokens(sf_dir: str, min_df: int = 2) -> rd.Dataset:
    """Vocabulary pruning — drop every token appearing in fewer than
    ``min_df`` documents and rebuild the text (single-space joined):
    (doc_id, clean_text). Hapax removal is the classic pre-tokenizer
    noise filter (typos, serial numbers, boilerplate ids).

    Two passes: (1) the bounded df pre-pass (per-batch DISTINCT-per-doc
    token value_counts, driver merge — at an unbounded real vocabulary the
    documented swap is a counting Bloom/most-frequent cutoff, same seam);
    (2) one streamed rebuild: keep-mask via searchsorted against the
    broadcast sorted keep-vocab, then ONE Arrow binary_join per batch over
    a re-offset ListArray — no per-row Python string assembly."""
    import ray

    def df_partial(b: pa.Table) -> pa.Table:
        la = pc.ascii_split_whitespace(b["text"]).combine_chunks()
        toks = la.values.to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy()
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(offs))
        real = toks != ""
        if not real.any():
            return pa.schema(
                [("token", pa.string()), ("pn", pa.int64())]
            ).empty_table()
        # distinct within doc: unique (doc, token) pairs
        import pandas as pd

        pairs = pd.DataFrame({"d": doc_idx[real], "t": toks[real]})
        dist = pairs.drop_duplicates()
        vc = dist["t"].value_counts()
        return pa.table(
            {"token": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
             "pn": pa.array(vc.to_numpy(), pa.int64())}
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    parts = [
        t for t in ray.get(
            docs.map_batches(df_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "token" in t.column_names
    ]
    if parts:
        df = (
            pa.concat_tables(parts).group_by("token").aggregate([("pn", "sum")])
            .to_pandas()
        )
        keep = np.sort(
            df.loc[df["pn_sum"] >= min_df, "token"].to_numpy(dtype=object)
        )
    else:
        keep = np.array([], dtype=object)
    keep_ref = ray.put(keep)

    def rebuild(b: pa.Table) -> pa.Table:
        kp = ray.get(keep_ref)
        la = pc.ascii_split_whitespace(b["text"]).combine_chunks()
        toks = la.values.to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy().astype(np.int64)
        real = toks != ""
        if len(kp) and len(toks):
            pos = np.minimum(np.searchsorted(kp, toks), len(kp) - 1)
            inv = kp[pos] == toks
        else:
            inv = np.zeros(len(toks), bool)
        m = real & inv
        cs = np.concatenate([[0], np.cumsum(m)])
        new_offs = cs[offs]
        kept = la.values.filter(pa.array(m))
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), kept
        )
        return pa.table(
            {"doc_id": b["doc_id"],
             "clean_text": pc.binary_join(lst, " ")}
        )

    return docs.map_batches(rebuild, batch_format="pyarrow")


def upsert_docs(sf_dir: str) -> rd.Dataset:
    """MERGE / upsert — apply a deterministic change feed (inserts,
    updates, deletes) onto the document table and return the merged
    snapshot (doc_id, text, source): the warehouse MERGE INTO and the
    CDC-apply step of every incremental corpus refresh.

    The change feed derives from the base (update text->upper where
    id%7==0, delete where id%11==3, insert id+100000 where id%13==5) so
    both engines see the identical feed without side files. Shape: tag
    base rows side=0 and change rows side=1, union, ONE doc_id shuffle;
    inside each id run precedence is vectorized masks — delete kills the
    run, update's payload wins over base, inserts pass through. Each
    side moves exactly once (diff_snapshots' shape with a writer's
    semantics)."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"])

    def with_changes(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        base = pa.table(
            {"doc_id": b["doc_id"], "text": b["text"],
             "source": b["source"],
             "side": pa.array(np.zeros(len(ids), dtype=np.int8)),
             "op": pa.array(["keep"] * len(ids), type=pa.string())}
        )
        upd_m = (ids % 7 == 0) & (ids % 11 != 3)
        del_m = ids % 11 == 3
        ins_m = ids % 13 == 5
        upd = b.filter(pa.array(upd_m))
        dels = b.filter(pa.array(del_m))
        ins = b.filter(pa.array(ins_m))
        changes = pa.table(
            {"doc_id": pa.array(
                np.concatenate([
                    upd["doc_id"].to_numpy(zero_copy_only=False),
                    dels["doc_id"].to_numpy(zero_copy_only=False),
                    ins["doc_id"].to_numpy(zero_copy_only=False) + 100_000,
                ]).astype(np.int64)),
             "text": pa.concat_arrays([
                 pc.utf8_upper(upd["text"]).combine_chunks(),
                 pa.array([""] * dels.num_rows, type=pa.string()),
                 ins["text"].combine_chunks(),
             ]),
             "source": pa.concat_arrays([
                 upd["source"].combine_chunks(),
                 dels["source"].combine_chunks(),
                 ins["source"].combine_chunks(),
             ]),
             "side": pa.array(
                 np.ones(upd.num_rows + dels.num_rows + ins.num_rows,
                         dtype=np.int8)),
             "op": pa.array(
                 ["update"] * upd.num_rows + ["delete"] * dels.num_rows
                 + ["insert"] * ins.num_rows, type=pa.string())}
        )
        return pa.concat_tables([base, changes])

    tagged = docs.map_batches(with_changes, batch_format="pyarrow")
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("source", pa.string())]
    )

    def merge_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        op = np.asarray(g["op"].to_pylist(), dtype=object)
        starts = run_starts(ids)
        lens = np.diff(np.append(starts, len(ids)))
        rid = np.repeat(np.arange(len(starts)), lens)
        run_deleted = np.zeros(len(starts), dtype=bool)
        np.logical_or.at(run_deleted, rid, op == "delete")
        run_updated = np.zeros(len(starts), dtype=bool)
        np.logical_or.at(run_updated, rid, op == "update")
        # keep: base row unless its run is deleted or updated; the update/
        # insert change row itself unless the run is deleted
        is_change = op != "keep"
        keep = ~run_deleted[rid] & np.where(
            is_change, op != "delete", ~run_updated[rid]
        )
        return g.select(["doc_id", "text", "source"]).filter(pa.array(keep))

    return grouped_runs(tagged, "doc_id", merge_runs,
                        sort_cols=["doc_id", "side"])


_CKSUM_P61 = (1 << 61) - 1  # Mersenne prime: order-independent fold domain


def docs_checksum(sf_dir: str) -> pa.Table:
    """Order-independent dataset fingerprint — 1 row (n_rows, checksum):
    the cheap anti-entropy check that two copies / two engines / a
    before-and-after-migration pair hold the SAME logical rows without
    shipping either side (pairs with diff_snapshots, which finds WHICH
    rows differ). checksum = sum of per-row md5-derived 64-bit values
    mod 2^61-1 — addition commutes, so row order, partitioning and
    engine parallelism cannot change it. Per-batch (count, sum) partials
    fold driver-side as Python ints; DuckDB's md5_number_upper() is
    bit-identical to Python's little-endian first-8-bytes md5."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        acc = 0
        for t in texts:
            acc += int.from_bytes(
                hashlib.md5((t or "").encode()).digest()[:8], "little"
            )
        return pa.table(
            {"pn": pa.array([len(texts)], pa.int64()),
             "ps_hi": pa.array([acc >> 62], pa.int64()),
             "ps_lo": pa.array([acc & ((1 << 62) - 1)], pa.int64())}
        )

    n = s = 0
    for t in ray.get(
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows:
            n += sum(t["pn"].to_pylist())
            s += sum((hi << 62) + lo for hi, lo in
                     zip(t["ps_hi"].to_pylist(), t["ps_lo"].to_pylist()))
    return pa.table(
        {"n_rows": pa.array([n], pa.int64()),
         "checksum": pa.array([s % _CKSUM_P61], pa.int64())}
    )


def weighted_sample_docs(sf_dir: str, k: int = 100) -> pa.Table:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
    draw ``k`` documents with inclusion probability proportional to their
    length — (doc_id, skey), skey descending. THE quality-weighted
    training-mix draw (sample high-signal docs more often) done as a
    single distributed top-k: each row gets key u^(1/w) for a
    deterministic uniform u and weight w = n_chars; the k largest keys
    ARE the weighted sample (Efraimidis & Spirakis 2006), so no
    sequential reservoir state is needed — sampling becomes an
    embarrassingly parallel scan + bounded merge, exactly what a
    10^12-row corpus requires.

    Exact-oracle float parity: u derives from DuckDB-reproducible md5
    (md5_number_upper == Python little-endian first-8-bytes md5, the
    docs_checksum trick) over CAST(doc_id AS VARCHAR); the key is the
    identical expression ``((h >> 11) + 1) * 2^-53`` then ``pow(u, 1/w)``
    on both engines — libm pow over identical doubles, ties broken by
    doc_id. Reads only (doc_id, n_chars): the text column never leaves
    storage."""
    import hashlib

    out_schema = pa.schema([("doc_id", pa.int64()), ("skey", pa.float64())])

    def local_topk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["n_chars"], 0))
        if b.num_rows == 0:
            return out_schema.empty_table()
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(int(i)).encode()).digest()[:8], "little"
            ) >> 11 for i in ids),
            dtype=np.int64, count=len(ids),
        )
        u = (h + 1) * (2.0 ** -53)
        skey = u ** (1.0 / w)
        order = np.lexsort((ids, -skey))[:k]
        return pa.table(
            {"doc_id": pa.array(ids[order], pa.int64()),
             "skey": pa.array(skey[order], pa.float64())}
        )

    parts = [
        t for t in ray.get(
            _docs(sf_dir, ["doc_id", "n_chars"])
            .map_batches(local_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "doc_id" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    m = pa.concat_tables(parts)  # bounded: <= k rows per batch
    ids = m["doc_id"].to_numpy(zero_copy_only=False)
    skey = m["skey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -skey))[:k]
    return pa.table(
        {"doc_id": pa.array(ids[order], pa.int64()),
         "skey": pa.array(skey[order], pa.float64())}
    )


def leakage_safe_split(sf_dir: str) -> rd.Dataset:
    """Near-dup-aware train/val/test split (90/5/5): ``hash_split_docs``'s
    splitmix64 rule, but the hash KEY is the MinHash near-dup cluster
    keeper (min-label; the doc's own id when unclustered) — so every
    near-dup cluster lands wholly in ONE split and near-duplicate
    train->eval contamination is impossible by construction. This is the
    split a pretraining pipeline should actually use; splitting by raw
    doc_id leaks every near-dup pair that straddles the boundary:
    (doc_id, split).

    Scale shape: clustering is the fully distributed
    ``text.minhash_neardup_clusters`` path; only the (doc_id, cluster_id)
    assignment — bounded by the duplicate volume — reaches the driver and
    broadcasts as two sorted int64 arrays; the split itself is one
    shuffle-free streamed map (searchsorted key swap + splitmix64). At a
    dup volume too big to broadcast, the key swap becomes a left
    shuffle_join on doc_id — the map is unchanged. The DuckDB oracle
    reproduces the whole chain (bit-exact MinHash CTEs -> recursive CC ->
    HUGEINT splitmix64) value-identically."""
    import ray

    from dedup_ray.functions.hashing import splitmix64
    from dedup_ray.pipelines.text import minhash_neardup_clusters

    cl = minhash_neardup_clusters(sf_dir)
    d = cl["doc_id"].to_numpy(dtype=np.int64)  # sorted by doc_id
    c = cl["cluster_id"].to_numpy(dtype=np.int64)
    ref = ray.put((d, c))
    t1, t2 = np.uint64(_SPLIT_T1), np.uint64(_SPLIT_T2)

    def assign(b: pa.Table) -> pa.Table:
        dd, cc = ray.get(ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        key = ids.astype(np.int64, copy=True)
        if len(dd):
            pos = np.minimum(np.searchsorted(dd, ids), len(dd) - 1)
            hit = dd[pos] == ids
            key[hit] = cc[pos[hit]]
        h = splitmix64(key)
        split = np.where(h < t1, "train", np.where(h < t2, "val", "test"))
        return pa.table({"doc_id": b["doc_id"], "split": pa.array(split)})

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


def temperature_mix_weights(sf_dir: str, alpha: float = 0.7):
    """Temperature-based source-mixing weights — the multilingual/multi-
    source sampling standard (p_i proportional to n_i^alpha, alpha < 1
    upweights small sources): (source, n_docs, weight, boost) where weight
    = n^alpha / sum(n^alpha) and boost = weight / natural share (>1 means
    the source is sampled above its natural frequency). This op COMPUTES
    the config that ``mix_sources`` applies.

    Scale shape: per-batch partial (source, count) folds — the driver
    holds one row per source (vocabulary-bounded, like
    ``wasted_bytes_by_fmt``); the power/normalize math is a few scalars.
    Floats are rounded to 8 places on both sides (pow/sum association
    differs between numpy and the oracle's aggregate order)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        vc = b["source"].value_counts()
        return pa.table(
            {"source": vc.field("values"),
             "n": vc.field("counts").cast(pa.int64())}
        )

    acc: dict[str, int] = {}
    for t in ray.get(
        _docs(sf_dir, columns=["source"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if t.num_rows and "source" in t.column_names:
            for s, n in zip(t["source"].to_pylist(), t["n"].to_pylist()):
                acc[s] = acc.get(s, 0) + int(n)

    srcs = sorted(acc)
    n = np.array([acc[s] for s in srcs], dtype=np.float64)
    pw = n ** alpha
    w = pw / pw.sum()
    nat = n / n.sum()
    # half-AWAY-from-zero at 8 places (one convention with the oracle's SQL
    # round(); np.round is half-to-even and diverges on exact ties —
    # round-2 advice). Values are positive, so floor(x*1e8 + 0.5) suffices.
    def r8(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e8 + 0.5) / 1e8

    return pd.DataFrame(
        {
            "source": srcs,
            "n_docs": n.astype("int64"),
            "weight": r8(w),
            "boost": r8(w / nat),
        }
    )
