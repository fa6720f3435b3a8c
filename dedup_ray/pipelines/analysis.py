"""Text-analysis operators over the ``documents`` table: token counting,
quality stats, language-ID heuristic, document fingerprinting — the
training-data-pipeline staples layered on the same engine."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions.hashing import winnow_fingerprints

def _docs(sf_dir: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    from dedup_ray.sources.io import read_view

    return read_view(f"{sf_dir}/documents.parquet", columns=columns, **kwargs)


def token_stats(sf_dir: str) -> rd.Dataset:
    """Per-lang token totals: (lang, n_docs, total_tokens). Token = \\S+ run.
    Pre-aggregated inside map_batches, tiny groupby after (ray_guide
    'Aggregation at scale')."""

    def partial(b: pa.Table) -> pa.Table:
        # token count == number of \S+ runs: one RE2 C++ pass, no per-row
        # Python (ASCII corpus: RE2 \S == Python unicode \S here); 0 for
        # empty/whitespace-only/null, matching the aligned DuckDB oracle
        toks = pc.fill_null(pc.count_substring_regex(b["text"], r"\S+"), 0)
        t = pa.table({"lang": b["lang"], "tok": toks})
        g = t.group_by("lang").aggregate(
            [("tok", "count", pc.CountOptions(mode="all")), ("tok", "sum")]
        )
        return pa.table(
            {"lang": g["lang"], "pn": g["tok_count"], "pt": g["tok_sum"]}
        )

    agg = (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .sum(["pn", "pt"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b["lang"],
                "n_docs": b["sum(pn)"].cast(pa.int64()),
                "total_tokens": b["sum(pt)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def quality_summary(sf_dir: str) -> rd.Dataset:
    """Per-source corpus quality aggregates: (source, n_docs, total_chars,
    total_tokens) — SQL-checkable; per-row scores live in quality_scores."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.fill_null(pc.count_substring_regex(b["text"], r"\S+"), 0)
        t = pa.table({"source": b["source"], "n_chars": b["n_chars"], "tok": toks})
        g = t.group_by("source").aggregate(
            [("tok", "count", pc.CountOptions(mode="all")), ("n_chars", "sum"),
             ("tok", "sum")]
        )
        return pa.table(
            {"source": g["source"], "pn": g["tok_count"],
             "pc_": g["n_chars_sum"], "pt": g["tok_sum"]}
        )

    agg = (
        _docs(sf_dir, ["source", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["pn", "pc_", "pt"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "source": b["source"],
                "n_docs": b["sum(pn)"].cast(pa.int64()),
                "total_chars": b["sum(pc_)"].cast(pa.int64()),
                "total_tokens": b["sum(pt)"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


class QualityScorer:
    """Per-row quality features (stopword ratio, punct ratio, mean token
    length) — all columns computed with RE2/numpy kernels, zero per-row
    Python. Stateless, so it runs as elastic tasks (instance passed to
    map_batches), not an actor pool."""

    STOP = frozenset(
        "the a an and or of to in is are was were be been it this that".split()
    )
    _STOP_ARR = pa.array(sorted(STOP))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Fully vectorized (ASCII corpus: RE2 classes == Python re classes):
        # words = maximal [a-z]+ runs of the lowercased text, obtained by
        # splitting on [^a-z]+ (empty boundary slots have length 0 and are
        # excluded by the nonempty mask); per-row reductions via cumsum
        # differences over the list offsets. All divisions are the same
        # int/int -> float64 IEEE ops as the scalar code, so values stay
        # bit-identical to the DuckDB oracle.
        texts = pc.fill_null(batch["text"], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        parts = pc.split_pattern_regex(pc.utf8_lower(texts), "[^a-z]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        off = parts.offsets.to_numpy().astype(np.int64)
        vals = parts.values  # absolute offsets index into values directly
        wlen = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = wlen > 0
        is_stop = pc.is_in(
            vals, value_set=self._STOP_ARR
        ).to_numpy(zero_copy_only=False)
        cs_n = np.concatenate([[0], np.cumsum(nonempty)])
        cs_len = np.concatenate([[0], np.cumsum(wlen)])
        cs_stop = np.concatenate([[0], np.cumsum(is_stop & nonempty)])
        n = cs_n[off[1:]] - cs_n[off[:-1]]
        sum_len = cs_len[off[1:]] - cs_len[off[:-1]]
        n_stop = cs_stop[off[1:]] - cs_stop[off[:-1]]
        safe_n = np.maximum(n, 1)
        tlen = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        n_punct = pc.count_substring_regex(texts, r"[^\w\s]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n, type=pa.int64()),
                "stopword_ratio": pa.array(
                    np.where(n > 0, n_stop / safe_n, 0.0), type=pa.float64()
                ),
                "punct_ratio": pa.array(
                    np.where(tlen > 0, n_punct / np.maximum(tlen, 1), 0.0),
                    type=pa.float64(),
                ),
                "mean_token_len": pa.array(
                    np.where(n > 0, sum_len / safe_n, 0.0), type=pa.float64()
                ),
            }
        )


def quality_scores(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer(), batch_format="pyarrow"
    )


class LangId:
    """Character-trigram language-ID heuristic. Profiles are built once per
    actor from small built-in seed text (deterministic; no model files)."""

    SEEDS = {
        "en": "the quick brown fox jumps over the lazy dog and then runs away with them",
        "de": "der schnelle braune fuchs springt über den faulen hund und läuft dann weg",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et s'enfuit",
        "es": "el rápido zorro marrón salta sobre el perro perezoso y luego huye con",
        "zh": "敏捷的棕色狐狸跳过懒狗然后跑掉了他们一起去了很远的地方看风景",
    }

    def __init__(self) -> None:
        self.profiles = {
            lang: self._trigrams(seed) for lang, seed in self.SEEDS.items()
        }
        self._prof_sorted = sorted(self.profiles.items())

    @staticmethod
    def _trigrams(t: str) -> set[str]:
        t = f"  {t.lower()}  "
        return {t[i : i + 3] for i in range(len(t) - 2)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            tg = self._trigrams(t or "")
            best, best_s = "und", -1.0
            for lang, prof in self._prof_sorted:
                s = len(tg & prof) / max(1, len(tg | prof))
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best)
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, type=pa.string())}
        )


def langid(sf_dir: str) -> rd.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def fingerprints(sf_dir: str, cfg: DedupConfig | None = None) -> rd.Dataset:
    """Rolling-hash winnowed fingerprint counts per doc: (doc_id, n_fp)."""
    cfg = cfg or DedupConfig()

    def fp(b: pa.Table) -> pa.Table:
        out = [
            int(winnow_fingerprints(t or "", cfg.substring_min_len, cfg.winnow_window).size)
            for t in b["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "n_fp": pa.array(out, type=pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def top_docs_per_lang(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Grouped top-k: the k longest documents per language, ties broken by
    doc_id: (lang, doc_id, n_chars). Two-level top-k so the shuffle moves at
    most k rows per (lang, batch): a vectorized per-batch local top-k prunes
    first, then one grouped_runs pass ranks complete lang groups — no
    per-group Python, no global sort."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b,
            sort_keys=[("lang", "ascending"), ("n_chars", "descending"),
                       ("doc_id", "ascending")],
        )
        b = b.take(idx)
        from dedup_ray.stages.grouped import run_ranks

        rank = run_ranks(b["lang"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(rank < k))

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    # local_topk is also the merge kernel: it re-sorts its (pruned) input
    # fully, so the bucket pass needs no extra pre-sort wrapper
    out = grouped_runs(ds, "lang", local_topk)
    return out.select_columns(["lang", "doc_id", "n_chars"])


def numeric_profile(sf_dir: str) -> rd.Dataset:
    """Distribution profile of a numeric column (n_chars): exact min / max /
    mean and exact p25/p50/p75 quantiles, computed scale-correctly for
    bounded-cardinality domains: each batch emits a partial (value, count)
    histogram, one tiny groupby merges them, and the quantile walk runs over
    the merged histogram (thousands of rows), never the data. Unbounded
    domains would swap the exact histogram for a mergeable sketch behind the
    same output schema. Output: one row
    (n_rows, min_v, max_v, mean_v, p25, p50, p75)."""

    def partial_hist(b: pa.Table) -> pa.Table:
        # null values are excluded from every stat, like SQL aggregates
        # (the oracle counts with count(n_chars), not count(*))
        vc = b["n_chars"].drop_null().value_counts()
        return pa.table(
            {
                "v": vc.field("values").cast(pa.int64()),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    hist = (
        _docs(sf_dir, columns=["n_chars"])
        .map_batches(partial_hist, batch_format="pyarrow")
        .groupby("v")
        .sum("n")
    )
    # an empty input yields ZERO blocks and the finish step would never run;
    # a null-keyed seed row (dropped inside profile) guarantees one batch so
    # the empty case still emits the SQL-parity aggregate row
    seed = rd.from_arrow(
        pa.table(
            {
                "v": pa.array([None], type=pa.int64()),
                "sum(n)": pa.array([0], type=pa.int64()),
            }
        )
    )
    hist = hist.union(seed)

    null_row = pa.table(
        {
            "n_rows": pa.array([0], type=pa.int64()),
            "min_v": pa.array([None], type=pa.int64()),
            "max_v": pa.array([None], type=pa.int64()),
            "mean_v": pa.array([None], type=pa.float64()),
            "p25": pa.array([None], type=pa.int64()),
            "p50": pa.array([None], type=pa.int64()),
            "p75": pa.array([None], type=pa.int64()),
        }
    )

    def profile(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["v"]))  # drop the seed row
        if b.num_rows == 0:
            # empty table: one aggregate row with NULL stats, like SQL
            return null_row
        from dedup_ray.stages.grouped import quantiles_from_hist

        v = b["v"].to_numpy(zero_copy_only=False)
        n = b["sum(n)"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        total = int(n.sum())
        p25, p50, p75 = quantiles_from_hist(v, n, (0.25, 0.5, 0.75))
        mean = float((v * n).sum()) / total
        return pa.table(
            {
                "n_rows": pa.array([total], type=pa.int64()),
                "min_v": pa.array([int(v[0])], type=pa.int64()),
                "max_v": pa.array([int(v[-1])], type=pa.int64()),
                "mean_v": pa.array([round(mean, 4)], type=pa.float64()),
                "p25": pa.array([p25], type=pa.int64()),
                "p50": pa.array([p50], type=pa.int64()),
                "p75": pa.array([p75], type=pa.int64()),
            }
        )

    # the merged histogram is small by construction — single-block finish
    return hist.repartition(1).map_batches(
        profile, batch_format="pyarrow", batch_size=None
    )


def top_terms(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Vocabulary top-k (wordcount): the k most frequent whitespace tokens
    across all documents, ties broken lexically: (token, n). Classic
    map-reduce, fully vectorized: per-batch Arrow split+flatten+value_counts
    partials (the combiner), one groupby over distinct tokens, then per-batch
    local top-k + a k-row global sort-limit — the full token stream is never
    shuffled, only (token, partial_count) rows."""

    def partial(b: pa.Table) -> pa.Table:
        # ascii_split_whitespace splits on exactly { \t\n\v\f\r}, the same
        # ASCII class the oracle's [^ \t\n\v\f\r]+ extraction uses (utf8_
        # split would also break on NBSP etc. and diverge); Arrow emits ''
        # at string edges where extract_all does not — drop them
        flat = pc.list_flatten(pc.ascii_split_whitespace(b["text"]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "pn": vc.field("counts").cast(pa.int64())}
        )

    agg = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("pn")
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("sum(pn)", "descending"), ("token", "ascending")]
        )
        return b.take(idx[: k])

    return (
        agg.map_batches(local_topk, batch_format="pyarrow")
        .sort(["sum(pn)", "token"], descending=[True, False])
        .limit(k)
        .map_batches(
            lambda b: pa.table(
                {"token": b["token"], "n": b["sum(pn)"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )


def _bpe_word_freqs(sf_dir: str, max_words: int = 30_000) -> dict[str, int]:
    """Distributed word-frequency table for BPE training, capped to the
    ``max_words`` most frequent words (ties lexical): the same partial-
    count + tiny-groupby + local-top-k shape as ``top_terms``, so only
    (token, count) rows ever move and the driver holds a BOUNDED table.
    The cap is the standard scale trick — merge statistics saturate long
    before the vocabulary tail (functions/bpe.py docstring)."""

    def partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.ascii_split_whitespace(b["text"]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "pn": vc.field("counts").cast(pa.int64())}
        )

    agg = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("pn")
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("sum(pn)", "descending"), ("token", "ascending")]
        )
        return b.take(idx[:max_words])

    rows = (
        agg.map_batches(local_topk, batch_format="pyarrow")
        .sort(["sum(pn)", "token"], descending=[True, False])
        .limit(max_words)
        .take_all()
    )
    return {r["token"]: int(r["sum(pn)"]) for r in rows}


def bpe_merges(sf_dir: str, n_merges: int = 200) -> pa.Table:
    """Train a BPE subword vocabulary on the corpus: (rank, left, right)
    merge rules in application order. Word counts are gathered distributed
    (``_bpe_word_freqs``); the merge loop itself runs on the driver over
    the bounded table — training state is O(vocab), never O(corpus).
    Deterministic (max count, lexicographic tie-break), so two runs emit
    identical tables. Rows-only query: an iterative learner is non-SQL;
    tests/test_bpe.py checks the incremental trainer against a
    recount-from-scratch reference and the published toy example."""
    from dedup_ray.functions.bpe import train_bpe

    merges = train_bpe(_bpe_word_freqs(sf_dir), n_merges)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), type=pa.int64()),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
        }
    )


def bpe_token_counts(sf_dir: str, n_merges: int = 200) -> rd.Dataset:
    """Apply the trained BPE tokenizer to every document: (doc_id,
    n_bpe_tokens) — the REAL token count the whitespace/regex counters
    approximate, and the quantity a pretraining pipeline bills by.

    Scale shape: train once driver-side on the bounded word-frequency
    table, then ship the merge list INTO an actor pool — ranks dict and
    word->segmentation cache built once per actor (``__init__``), batches
    encoded via per-batch np.unique so each distinct word is segmented
    once per batch and amortized to a dict hit across batches (Zipf).
    One streamed map, no shuffle."""
    from dedup_ray.functions.bpe import train_bpe

    merges = train_bpe(_bpe_word_freqs(sf_dir), n_merges)
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        BpeEncoder,
        fn_constructor_args=(merges,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


class BpeEncoder:
    """Actor-pool BPE apply stage: ranks dict + word-segmentation cache
    built once per actor; per batch each DISTINCT word is segmented once
    (np.unique) and amortized to a dict hit across batches (Zipf).
    Module-level with explicit ctor args so the serialized actor stays
    small (no closure capture)."""

    def __init__(self, merges: list[tuple[str, str]]) -> None:
        from dedup_ray.functions.bpe import encode_word

        self._encode = encode_word
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.cache: dict[str, tuple[str, ...]] = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        words_per_doc = [t.split() if t else [] for t in texts]
        flat = [w for ws in words_per_doc for w in ws]
        uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        tok_len = np.array(
            [len(self._encode(w, self.ranks, self.cache)) for w in uniq],
            dtype=np.int64,
        )
        per_word = tok_len[inv] if len(flat) else np.empty(0, dtype=np.int64)
        bounds = np.cumsum([0] + [len(ws) for ws in words_per_doc])
        counts = np.add.reduceat(
            np.append(per_word, 0), bounds[:-1]
        ) * (np.diff(bounds) > 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )


def lm_perplexity_scores(sf_dir: str) -> rd.Dataset:
    """Language-model quality scoring (the CCNet-style perplexity filter):
    train a char-bigram LM on the corpus, score every document by its
    bits-per-bigram under the model: (doc_id, n_bigrams, bits_per_bigram).
    Low bits = fluent/common phrasing, high bits = noise/garbage — the
    classic cheap stand-in for a KenLM wikipedia model (Wenzek et al. 2020,
    "CCNet"), self-contained because the model trains on the data itself.

    Scale shape: training statistics are (bigram, count) partials BOUNDED
    BY THE CHARSET SQUARED — per-batch np.unique partials, one tiny groupby
    merge, driver builds the add-one-smoothed log2 table once and
    broadcasts it via ray.put; scoring is one streamed map doing a dense
    2-D LUT gather per batch (no per-char Python). Two passes over text,
    no shuffle of document rows. Rows-only: transcendental log2 sums are
    not reproducible bit-exactly in SQL; tests/test_lm.py replays the
    kernel in-process and bounds fluent-vs-garbage separation."""
    import ray

    from dedup_ray.stages.grouped import merge_partial_counts

    def bigram_partial(b: pa.Table) -> pa.Table:
        cps = [
            np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            for t in b["text"].to_pylist()
            if t and len(t) >= 2
        ]
        if not cps:
            return pa.table(
                {"bg": pa.array([], type=pa.int64()),
                 "pn": pa.array([], type=pa.int64())}
            )
        # bigram id = hi*2^21 | lo (codepoints < 2^21); counts per batch
        pairs = np.concatenate(
            [c[:-1].astype(np.int64) << 21 | c[1:].astype(np.int64) for c in cps]
        )
        u, cnt = np.unique(pairs, return_counts=True)
        return pa.table(
            {"bg": pa.array(u, type=pa.int64()),
             "pn": pa.array(cnt, type=pa.int64())}
        )

    parts = [
        t
        for t in ray.get(
            _docs(sf_dir, columns=["text"])
            .map_batches(bigram_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows and "bg" in t.column_names
    ]
    if parts:
        merged = pa.concat_tables(parts)
        bgs, counts = merge_partial_counts(
            merged["bg"].to_numpy(zero_copy_only=False),
            merged["pn"].to_numpy(zero_copy_only=False),
        )
    else:
        bgs = counts = np.empty(0, dtype=np.int64)

    # add-one-smoothed conditional log2 P(next | prev): dense per-prev
    # normalization over the OBSERVED charset (bounded)
    prev_ids = bgs >> 21
    next_ids = bgs & ((1 << 21) - 1)
    charset = np.unique(np.concatenate([prev_ids, next_ids]))
    v = charset.size
    pi = np.searchsorted(charset, prev_ids)
    prev_tot = np.zeros(v, dtype=np.int64)
    np.add.at(prev_tot, pi, counts)
    # log2 of smoothed probability for every OBSERVED bigram; unseen
    # bigrams of seen prev get the same smoothed floor, unseen chars get
    # the global floor
    obs_bits = -np.log2((counts + 1.0) / (prev_tot[pi] + v + 1.0))
    floor_bits = -np.log2(1.0 / (prev_tot + v + 1.0))
    global_floor = float(np.log2(v + 1.0)) if v else 1.0
    model = ray.put((bgs, obs_bits, charset, floor_bits, global_floor))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("bits_per_bigram", pa.float64())]
    )

    def score(b: pa.Table) -> pa.Table:
        m_bgs, m_bits, m_cs, m_floor, m_gf = ray.get(model)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out_n = np.zeros(len(ids), dtype=np.int64)
        out_b = np.zeros(len(ids), dtype=np.float64)
        for i, t in enumerate(b["text"].to_pylist()):
            if not t or len(t) < 2:
                continue
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            pairs = c[:-1] << 21 | c[1:]
            pos = np.searchsorted(m_bgs, pairs)
            pos_c = np.minimum(pos, max(m_bgs.size - 1, 0))
            hit = (m_bgs[pos_c] == pairs) if m_bgs.size else np.zeros(
                pairs.size, bool
            )
            bits = np.empty(pairs.size, dtype=np.float64)
            bits[hit] = m_bits[pos_c[hit]]
            # unseen bigram: floor of its prev char, or the global floor
            miss_prev = c[:-1][~hit]
            ppos = np.minimum(
                np.searchsorted(m_cs, miss_prev), max(m_cs.size - 1, 0)
            )
            phit = (m_cs[ppos] == miss_prev) if m_cs.size else np.zeros(
                miss_prev.size, bool
            )
            mb = np.full(miss_prev.size, m_gf, dtype=np.float64)
            mb[phit] = m_floor[ppos[phit]]
            bits[~hit] = mb
            out_n[i] = pairs.size
            out_b[i] = bits.mean()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": pa.array(out_n, type=pa.int64()),
                "bits_per_bigram": pa.array(out_b, type=pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def lang_length_quantiles(sf_dir: str) -> rd.Dataset:
    """Grouped distribution profile: exact per-language p25/p50/p75 of
    n_chars: (lang, n_docs, p25, p50, p75). Same mergeable-histogram design
    as numeric_profile, per group: batches emit (lang, value, count)
    partials, ONE grouped_runs pass merges each language's histogram and
    walks its quantiles — the documents themselves never shuffle, only
    histogram rows (bounded by distinct (lang, n_chars) pairs)."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def partial_hist(b: pa.Table) -> pa.Table:
        # null n_chars rows are excluded, like SQL aggregates (the oracle
        # counts with count(n_chars), and quantile_disc ignores nulls)
        b = b.filter(pc.is_valid(b["n_chars"]))
        g = b.group_by(["lang", "n_chars"]).aggregate(
            [("n_chars", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {
                "lang": g["lang"],
                "v": g["n_chars"].cast(pa.int64()),
                "pn": g["n_chars_count"].cast(pa.int64()),
            }
        )

    schema = pa.schema(
        [("lang", pa.string()), ("n_docs", pa.int64()), ("p25", pa.int64()),
         ("p50", pa.int64()), ("p75", pa.int64())]
    )

    def quantiles_per_lang(g: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import quantiles_from_hist

        if g.num_rows == 0:
            return schema.empty_table()
        lang = g["lang"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        n = g["pn"].to_numpy(zero_copy_only=False)
        starts = run_starts(lang)
        bounds = np.append(starts, len(lang))
        out = {"lang": [], "n_docs": [], "p25": [], "p50": [], "p75": []}
        for i in range(len(starts)):  # one iteration per LANGUAGE, not row
            lo, hi = bounds[i], bounds[i + 1]
            # v is sorted within the run (bucket sort_cols), duplicate
            # values from different batches merge inside the helper
            row = quantiles_from_hist(v[lo:hi], n[lo:hi], (0.25, 0.5, 0.75))
            out["lang"].append(lang[lo])
            out["n_docs"].append(int(n[lo:hi].sum()))
            out["p25"].append(row[0])
            out["p50"].append(row[1])
            out["p75"].append(row[2])
        return pa.table(
            {
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_docs": pa.array(out["n_docs"], type=pa.int64()),
                "p25": pa.array(out["p25"], type=pa.int64()),
                "p50": pa.array(out["p50"], type=pa.int64()),
                "p75": pa.array(out["p75"], type=pa.int64()),
            }
        )

    hist = _docs(sf_dir, columns=["lang", "n_chars"]).map_batches(
        partial_hist, batch_format="pyarrow"
    )
    return grouped_runs(hist, "lang", quantiles_per_lang, sort_cols=["lang", "v"])


def rarest_term_per_doc(sf_dir: str) -> rd.Dataset:
    """Keyword extraction: each document's globally-rarest token, with its
    corpus document frequency: (doc_id, term, df); ties broken by the term
    string, min df = the most distinctive word. The integer-only variant of
    TF-IDF keywording (no float idf), so the output is bit-deterministic
    and fully value-checkable.

    Scale shape: two bounded shuffles of the distinct (term, doc) pair set
    and nothing else. Pass 1 groups pairs BY TERM (grouped_runs), where df
    is just the run length — and the same kernel immediately pre-reduces to
    at most ONE row per doc per bucket (the bucket-local min), so pass 2's
    BY-DOC shuffle moves <= num_buckets rows per doc, independent of doc
    length. Docs whose text has no tokens are absent (SQL-join parity)."""
    from dedup_ray.pipelines.curation import _token_lists
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def pairs(b: pa.Table) -> pa.Table:
        from dedup_ray.stages.grouped import distinct_pairs

        toks, counts = _token_lists(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        toks, doc = distinct_pairs(toks, np.repeat(ids, counts))
        return pa.table(
            {"term": pa.array(toks.astype(object), type=pa.string()),
             "doc_id": pa.array(doc, type=pa.int64())}
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("df", pa.int64())]
    )

    def df_and_local_min(g: pa.Table) -> pa.Table:
        """g: complete term-groups, sorted by (term, doc_id). df = run
        length (pairs are globally distinct: a doc lives in one batch).
        Emit each doc's min-(df, term) row WITHIN this bucket."""
        t = g["term"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return out_schema.empty_table()
        starts = run_starts(t)
        lens = np.diff(np.append(starts, len(t)))
        df = np.repeat(lens, lens)
        order = np.lexsort((t, df, d))  # by doc, then df, then term
        d, t, df = d[order], t[order], df[order]
        first = run_starts(d)
        return pa.table(
            {"doc_id": pa.array(d[first], type=pa.int64()),
             "term": pa.array(t[first].astype(object), type=pa.string()),
             "df": pa.array(df[first], type=pa.int64())}
        )

    def global_min(g: pa.Table) -> pa.Table:
        """g: complete doc-groups sorted by (doc_id, df, term) — the first
        row of each run is the answer."""
        if g.num_rows == 0:
            return out_schema.empty_table()
        first = run_starts(g["doc_id"].to_numpy(zero_copy_only=False))
        return g.take(pa.array(first, type=pa.int64()))

    p = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    annotated = grouped_runs(p, "term", df_and_local_min,
                             sort_cols=["term", "doc_id"])
    return grouped_runs(annotated, "doc_id", global_min,
                        sort_cols=["doc_id", "df", "term"])


def length_quartiles(sf_dir: str, n_buckets: int = 4) -> rd.Dataset:
    """Exact global ntile bucketing by (n_chars, doc_id): (doc_id, quartile
    in 1..n_buckets) — SQL's ``ntile(4) OVER (ORDER BY n_chars, doc_id)``
    with the tie order pinned so both sides are deterministic. The building
    block for length-stratified sampling / curriculum sharding.

    Scale shape: no global sort. A (value, count) histogram (bounded
    cardinality, like numeric_profile) is merged in a tiny groupby and
    pulled to the driver; its prefix-sum gives every value's global rank
    offset, broadcast via ray.put. ONE grouped_runs pass by value then
    ranks doc_ids within each value-run and applies the ntile formula —
    documents shuffle once, by value."""
    import ray

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def partial_hist(b: pa.Table) -> pa.Table:
        vc = b["n_chars"].drop_null().value_counts()
        return pa.table(
            {"v": vc.field("values").cast(pa.int64()),
             "n": vc.field("counts").cast(pa.int64())}
        )

    hist = (
        _docs(sf_dir, columns=["n_chars"])
        .map_batches(partial_hist, batch_format="pyarrow")
        .groupby("v")
        .sum("n")
    )
    rows = hist.take_all()  # bounded: one row per DISTINCT length value
    vals = np.array(sorted(r["v"] for r in rows), dtype=np.int64)
    cnt = {r["v"]: r["sum(n)"] for r in rows}
    counts = np.array([cnt[v] for v in vals], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    base, rem = divmod(n_total, n_buckets)
    lut = ray.put((vals, offsets))

    out_schema = pa.schema([("doc_id", pa.int64()), ("quartile", pa.int64())])

    def bucketize(g: pa.Table) -> pa.Table:
        """g: complete n_chars-groups sorted by (n_chars, doc_id)."""
        # null lengths are outside the rank domain (the histogram pass
        # drops them with drop_null, SQL count(n_chars) semantics) — filter
        # them here too or searchsorted(NaN) would index past the LUT
        g = g.filter(pc.is_valid(g["n_chars"]))
        if g.num_rows == 0:
            return out_schema.empty_table()
        vals_b, offs_b = ray.get(lut)
        v = g["n_chars"].to_numpy(zero_copy_only=False)
        from dedup_ray.stages.grouped import run_ranks

        within = run_ranks(v)
        r0 = offs_b[np.searchsorted(vals_b, v)] + within  # 0-based global rank
        pivot = rem * (base + 1)
        if base == 0:  # fewer rows than buckets: ntile gives rank+1
            q = r0 + 1
        else:
            q = np.where(r0 < pivot, r0 // (base + 1),
                         rem + (r0 - pivot) // base) + 1
        return pa.table(
            {"doc_id": g["doc_id"],
             "quartile": pa.array(q, type=pa.int64())}
        )

    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return grouped_runs(docs, "n_chars", bucketize,
                        sort_cols=["n_chars", "doc_id"])


def df_histogram(sf_dir: str) -> rd.Dataset:
    """Vocabulary frequency-of-frequencies: how many distinct terms occur
    in exactly n documents: (df, n_terms). The corpus-statistics profile
    behind vocabulary pruning / min-df cutoffs (a Zipf check at a glance).

    Scale shape: distinct (term, doc) pairs per batch, ONE grouped_runs
    pass BY TERM where df = run length — and the kernel immediately
    collapses to per-df partial counts, so the final groupby merges at most
    ~64 tiny (df, count) rows per bucket. Terms never leave the bucket."""
    from dedup_ray.pipelines.curation import _token_lists
    from dedup_ray.stages.grouped import distinct_pairs, grouped_runs, run_starts

    def pairs(b: pa.Table) -> pa.Table:
        toks, counts = _token_lists(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t, d = distinct_pairs(toks, np.repeat(ids, counts))
        return pa.table(
            {"term": pa.array(t.astype(object), type=pa.string()),
             "doc_id": pa.array(d, type=pa.int64())}
        )

    def df_counts(g: pa.Table) -> pa.Table:
        t = g["term"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return pa.table(
                {"df": pa.array([], type=pa.int64()),
                 "pn": pa.array([], type=pa.int64())}
            )
        starts = run_starts(t)
        lens = np.diff(np.append(starts, len(t)))  # df per complete term run
        u, c = np.unique(lens, return_counts=True)
        return pa.table(
            {"df": pa.array(u, type=pa.int64()),
             "pn": pa.array(c, type=pa.int64())}
        )

    p = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    agg = grouped_runs(p, "term", df_counts).groupby("df").sum("pn")
    return agg.map_batches(
        lambda b: pa.table(
            {"df": b["df"], "n_terms": b["sum(pn)"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def trim_length_outliers(
    sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95
) -> rd.Dataset:
    """Quantile-trim filter: keep docs whose n_chars lies inside the
    corpus's [p05, p95] (quantile_disc semantics) — the standard
    outlier-removal pass before training (degenerate-short and runaway-long
    docs out): (doc_id, n_chars).

    Scale shape: pass 1 is a projection-pruned partial (value, count)
    histogram per batch merged on the driver (bounded by the DOMAIN of the
    column, not the row count — same argument as numeric_profile); the two
    thresholds then push into pass 2's scan as a parquet predicate, so row
    groups wholly outside [lo, hi] are never read. No shuffle in either
    pass."""
    import pyarrow.dataset as pads

    from dedup_ray.stages.grouped import collect_value_hist, quantiles_from_hist

    v, n = collect_value_hist(_docs(sf_dir, columns=["n_chars"]), "n_chars")
    if v.size == 0:
        return rd.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
            .empty_table()
        )
    lo, hi = quantiles_from_hist(v, n, (q_lo, q_hi))
    return _docs(
        sf_dir,
        columns=["doc_id", "n_chars"],
        predicate=(pads.field("n_chars") >= lo) & (pads.field("n_chars") <= hi),
    )


def length_cume_dist(sf_dir: str) -> rd.Dataset:
    """Global cumulative-distribution window WITHOUT a global sort:
    cume_dist() OVER (ORDER BY n_chars) per doc — (doc_id, n_chars, cume).

    Scale shape: same two-pass histogram trick as length_quartiles /
    trim_length_outliers — pass 1 merges per-batch (value, count) partials
    driver-side (bounded by the column DOMAIN), pass 2 broadcasts the tiny
    (values, cumulative counts) arrays into a streamed searchsorted probe.
    No shuffle, no sort, and cume = one int/int IEEE division of exact
    counts, so the DuckDB window-function oracle matches bit-identically."""
    import ray

    from dedup_ray.stages.grouped import collect_value_hist

    v, n = collect_value_hist(_docs(sf_dir, columns=["n_chars"]), "n_chars")
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_chars", pa.int64()), ("cume", pa.float64())]
    )
    if v.size == 0:
        return rd.from_arrow(schema.empty_table())
    cum = np.cumsum(n)
    total = int(cum[-1])
    ref = ray.put((v, cum))

    def probe(b: pa.Table) -> pa.Table:
        vv, cc = ray.get(ref)
        x = b["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vv, x, side="right") - 1
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "cume": pa.array(cc[idx] / total, type=pa.float64()),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "n_chars"]).map_batches(
        probe, batch_format="pyarrow"
    )


def lang_source_matrix(sf_dir: str) -> rd.Dataset:
    """Pivot / crosstab: one row per language, one count column per source —
    (lang, n_src0..n_src19). The corpus-composition dashboard view.

    Scale shape: per-batch (lang, source) partial counts (Arrow C++
    group_by), one tiny groupby merge — only (lang, source, n) rows ever
    move, bounded by the CROSS-DOMAIN size, not the row count; the pivot
    itself is a single-block finish map over that tiny table (same shape as
    events_rollup's coarse levels). Columns are the fixed source domain;
    an unbounded domain would keep the long (lang, source, n) form."""
    n_sources = 20

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate(
            [("source", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"lang": g["lang"], "source": g["source"], "pn": g["source_count"]}
        )

    merged = (
        _docs(sf_dir, columns=["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("pn")
    )

    def pivot(b: pa.Table) -> pa.Table:
        langs = np.asarray(b["lang"].to_pylist(), dtype=object)
        srcs = np.asarray(
            [int(s[3:]) for s in b["source"].to_pylist()], dtype=np.int64
        )
        n = b["sum(pn)"].to_numpy(zero_copy_only=False)
        ul = np.unique(langs)
        li = {v: i for i, v in enumerate(ul)}
        mat = np.zeros((len(ul), n_sources), dtype=np.int64)
        rows = np.fromiter((li[v] for v in langs), dtype=np.int64, count=len(langs))
        mat[rows, srcs] = n
        cols: dict = {"lang": pa.array(list(ul), type=pa.string())}
        for s in range(n_sources):
            cols[f"n_src{s}"] = pa.array(mat[:, s], type=pa.int64())
        return pa.table(cols)

    return merged.repartition(1).map_batches(
        pivot, batch_format="pyarrow", batch_size=None
    )


def lang_shared_terms(sf_dir: str, lang_a: str = "en", lang_b: str = "de") -> rd.Dataset:
    """Set operation (INTERSECT): distinct tokens that occur in documents of
    BOTH languages: (token). The cross-corpus vocabulary-overlap probe."""
    return _lang_term_setop(sf_dir, lang_a, lang_b, "intersect", k=None)


def lang_exclusive_shingles(
    sf_dir: str, lang_a: str = "en", lang_b: str = "de", k: int = 3
) -> rd.Dataset:
    """Set operation (EXCEPT): distinct k-token shingles of lang_a's
    documents that never occur in lang_b's: (token). Shingle granularity
    because the synthetic corpus draws every single TOKEN from one shared
    pool (token-level EXCEPT is empty by construction at every sf);
    word-sequence phrasing is what actually distinguishes the subsets."""
    return _lang_term_setop(sf_dir, lang_a, lang_b, "except", k=k)


def _lang_term_setop(
    sf_dir: str, lang_a: str, lang_b: str, mode: str, k: int | None = None
) -> rd.Dataset:
    """Shared kernel for the vocabulary set operations.

    Scale shape: per batch, distinct (token, lang) pairs for the two langs
    only (vectorized lexsort dedup); ONE grouped_runs on token applies the
    set predicate to each run — only distinct pairs shuffle, tokens never
    leave their bucket."""
    from dedup_ray.pipelines.curation import _token_lists
    from dedup_ray.stages.grouped import distinct_pairs, grouped_runs, run_starts

    def partial(b: pa.Table) -> pa.Table:
        sel = pc.is_in(b["lang"], value_set=pa.array([lang_a, lang_b]))
        t = b.filter(sel)
        toks, counts = _token_lists(t["text"])
        row_is_b = pc.equal(t["lang"], lang_b).to_numpy(zero_copy_only=False)
        if k is None:
            keys, key_rows = toks, np.repeat(np.arange(len(counts)), counts)
        else:
            from dedup_ray.pipelines.curation import _shingles

            keys, key_rows = _shingles(toks, counts, k)
        tok, lb = distinct_pairs(keys, row_is_b[key_rows].astype(np.int64))
        return pa.table(
            {"token": pa.array(tok.astype(object), type=pa.string()),
             "is_b": pa.array(lb, type=pa.int64())}
        )

    def setop_runs(g: pa.Table) -> pa.Table:
        tok = g["token"].to_numpy(zero_copy_only=False)
        lb = g["is_b"].to_numpy(zero_copy_only=False)
        starts = run_starts(tok)
        if starts.size == 0:
            return pa.table({"token": pa.array([], type=pa.string())})
        bounds = np.append(starts, len(tok))
        has_a = np.add.reduceat((lb == 0).astype(np.int64), starts) > 0
        has_b = np.add.reduceat((lb == 1).astype(np.int64), starts) > 0
        # reduceat quirk: single-element runs are fine (start < len always)
        keep = (has_a & has_b) if mode == "intersect" else (has_a & ~has_b)
        return pa.table({"token": pa.array(tok[starts][keep], type=pa.string())})

    parts = _docs(sf_dir, columns=["lang", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_runs(parts, "token", setop_runs, sort_cols=["token", "is_b"])


def term_postings(sf_dir: str, max_postings: int = 20) -> rd.Dataset:
    """Inverted index: (term, df, postings) where df = # distinct docs
    containing the term and postings = the first ``max_postings`` doc_ids
    ascending, comma-joined — the search-engine posting-list build, capped
    so the output row stays bounded no matter how common the term.

    Scale shape: ONE shuffle of the distinct (term, doc) pair set (the
    per-batch combiner dedups before anything moves), grouped_runs by term,
    then run-length df + a head slice per run. The per-run string join is
    Python but runs once per VOCAB ENTRY (bounded), not per posting."""
    from dedup_ray.pipelines.curation import _token_lists
    from dedup_ray.stages.grouped import distinct_pairs, grouped_runs, run_starts

    def pairs(b: pa.Table) -> pa.Table:
        toks, counts = _token_lists(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        toks, doc = distinct_pairs(toks, np.repeat(ids, counts))
        return pa.table(
            {"term": pa.array(toks.astype(object), type=pa.string()),
             "doc_id": pa.array(doc, type=pa.int64())}
        )

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )

    def postings_runs(g: pa.Table) -> pa.Table:
        t = g["term"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return out_schema.empty_table()
        starts = run_starts(t)
        bounds = np.append(starts, len(t))
        lens = np.diff(bounds)
        post = [
            ",".join(map(str, d[s: min(s + max_postings, e)]))
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        return pa.table(
            {"term": pa.array(t[starts].astype(object), type=pa.string()),
             "df": pa.array(lens, type=pa.int64()),
             "postings": pa.array(post, type=pa.string())}
        )

    p = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    return grouped_runs(p, "term", postings_runs, sort_cols=["term", "doc_id"])


def term_cooccurrence(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Co-occurrence of the top-k vocabulary terms within documents:
    (ta, tb, n_docs), ta < tb — the PMI/word-vector building block. Two
    bounded passes: (1) the top_terms df pre-pass (per-batch value_counts
    partials, driver merge of the bounded vocab — no shuffle) picks the k
    most frequent tokens deterministically (count desc, token asc);
    (2) one streamed map generates each doc's distinct top-term pairs
    IN PLACE (a doc never spans batches, so pairs need no shuffle —
    bounded by k^2 per doc), pre-aggregated per batch with Arrow group_by;
    a final tiny (ta, tb) groupby merges partials."""
    import ray

    from dedup_ray.stages.grouped import run_starts

    def vocab_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.ascii_split_whitespace(b["text"]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "pn": vc.field("counts").cast(pa.int64())}
        )

    docs = _docs(sf_dir, columns=["text"])
    parts = [
        t for t in ray.get(
            docs.map_batches(vocab_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "token" in t.column_names
    ]
    out_schema = pa.schema(
        [("ta", pa.string()), ("tb", pa.string()), ("n_docs", pa.int64())]
    )
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    vocab = (
        pa.concat_tables(parts).group_by("token").aggregate([("pn", "sum")])
        .to_pandas()
        .sort_values(["pn_sum", "token"], ascending=[False, True], kind="stable")
        .head(k)
    )
    # membership probe wants a LEX-sorted array; code i = lex rank
    top = np.sort(vocab["token"].to_numpy(dtype=object))
    top_ref = ray.put(top)

    def pair_partial(b: pa.Table) -> pa.Table:
        tt = ray.get(top_ref)
        la = pc.ascii_split_whitespace(b["text"]).combine_chunks()
        toks = la.values.to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy()
        doc_idx = np.repeat(
            np.arange(b.num_rows, dtype=np.int64), np.diff(offs)
        )
        if len(toks) == 0 or len(tt) == 0:
            return pa.schema(
                [("ta", pa.string()), ("tb", pa.string()), ("pn", pa.int64())]
            ).empty_table()
        pos = np.minimum(np.searchsorted(tt, toks), len(tt) - 1)
        hit = tt[pos] == toks
        key = doc_idx[hit] * len(tt) + pos[hit]
        key = np.unique(key)  # distinct (doc, code), sorted
        d, c = key // len(tt), key % len(tt)
        starts = run_starts(d)
        bounds = np.append(starts, len(d))
        out_a, out_b = [], []
        for r in np.flatnonzero(np.diff(bounds) >= 2):
            run = c[bounds[r]: bounds[r + 1]]  # lex-sorted codes
            iu, ju = np.triu_indices(len(run), 1)
            out_a.append(run[iu])
            out_b.append(run[ju])
        if not out_a:
            return pa.schema(
                [("ta", pa.string()), ("tb", pa.string()), ("pn", pa.int64())]
            ).empty_table()
        t = pa.table(
            {"ca": pa.array(np.concatenate(out_a), pa.int64()),
             "cb": pa.array(np.concatenate(out_b), pa.int64())}
        )
        agg = t.group_by(["ca", "cb"]).aggregate(
            [("ca", "count", pc.CountOptions(mode="all"))]
        )
        dic = pa.array(tt, type=pa.string())
        return pa.table(
            {"ta": dic.take(agg["ca"]), "tb": dic.take(agg["cb"]),
             "pn": agg["ca_count"].cast(pa.int64())}
        )

    agg = (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["ta", "tb"])
        .sum("pn")
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return out_schema.empty_table()
        return pa.table(
            {"ta": b["ta"], "tb": b["tb"],
             "n_docs": b["sum(pn)"].cast(pa.int64())}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def source_lang_purity(sf_dir: str) -> rd.Dataset:
    """Per-source language purity: the dominant language and its share —
    (source, top_lang, n_docs, purity). The corpus-homogeneity signal a
    mixing recipe needs before weighting sources. Per-batch (source, lang)
    Arrow group_by partials shrink movement to the cross-domain; ONE tiny
    groupby merges them; the single-block finish argmaxes per source
    (tie: lexicographically first lang) and divides once — double/double
    in both engines, bit-identical hashes."""

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b["source"], "lang": b["lang"]})
        g = t.group_by(["source", "lang"]).aggregate(
            [("lang", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"source": g["source"], "lang": g["lang"],
             "pn": g["lang_count"].cast(pa.int64())}
        )

    agg = (
        _docs(sf_dir, columns=["source", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum("pn")
    )
    schema = pa.schema(
        [("source", pa.string()), ("top_lang", pa.string()),
         ("n_docs", pa.int64()), ("purity", pa.float64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        df = pa.table(
            {"source": b["source"], "lang": b["lang"],
             "n": b["sum(pn)"].cast(pa.int64())}
        ).to_pandas()
        df = df.sort_values(["source", "n", "lang"],
                            ascending=[True, False, True], kind="stable")
        top = df.groupby("source", sort=True).head(1).set_index("source")
        total = df.groupby("source", sort=True)["n"].sum()
        return pa.table(
            {"source": pa.array(total.index, pa.string()),
             "top_lang": pa.array(top.loc[total.index, "lang"], pa.string()),
             "n_docs": pa.array(total.to_numpy(), pa.int64()),
             "purity": pa.array(
                 top.loc[total.index, "n"].to_numpy().astype(np.float64)
                 / total.to_numpy().astype(np.float64), pa.float64())}
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def oov_rate(sf_dir: str, k: int = 50) -> rd.Dataset:
    """Out-of-vocabulary rate vs the top-k corpus vocabulary: per document,
    (doc_id, n_tokens, n_oov, rate) — the tokenizer-coverage signal that
    decides whether a vocab / BPE merge table fits a new corpus. Reuses
    term_cooccurrence's bounded df pre-pass for the vocabulary (count desc,
    token asc — deterministic); scoring is ONE streamed map with a
    broadcast sorted vocab probed by np.searchsorted. rate is int/int
    division on both engines."""
    import ray

    def vocab_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.ascii_split_whitespace(b["text"]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "pn": vc.field("counts").cast(pa.int64())}
        )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    parts = [
        t for t in ray.get(
            docs.map_batches(vocab_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "token" in t.column_names
    ]
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
         ("n_oov", pa.int64()), ("rate", pa.float64())]
    )
    if not parts:
        top = np.array([], dtype=object)
    else:
        vocab = (
            pa.concat_tables(parts).group_by("token").aggregate([("pn", "sum")])
            .to_pandas()
            .sort_values(["pn_sum", "token"], ascending=[False, True],
                         kind="stable")
            .head(k)
        )
        top = np.sort(vocab["token"].to_numpy(dtype=object))
    top_ref = ray.put(top)

    def score(b: pa.Table) -> pa.Table:
        tt = ray.get(top_ref)
        la = pc.ascii_split_whitespace(b["text"]).combine_chunks()
        toks = la.values.to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy()
        # '' edge artifacts of the splitter are not tokens
        real = toks != ""
        if len(tt) and len(toks):
            pos = np.minimum(np.searchsorted(tt, toks), len(tt) - 1)
            inv = tt[pos] == toks
        else:
            inv = np.zeros(len(toks), bool)
        if len(toks):
            # clamp: reduceat rejects a start index == len(arr) (trailing
            # empty doc); empty slices also copy the next element — both
            # cases zeroed via the `empty` mask below
            idx = np.minimum(offs[:-1], len(toks) - 1)
            n_tok = np.add.reduceat(real.astype(np.int64), idx)
            n_in = np.add.reduceat((real & inv).astype(np.int64), idx)
        else:
            n_tok = np.zeros(b.num_rows, np.int64)
            n_in = np.zeros(b.num_rows, np.int64)
        empty = np.diff(offs) == 0
        n_tok[empty] = 0
        n_in[empty] = 0
        n_oov = n_tok - n_in
        rate = np.divide(n_oov, n_tok, out=np.zeros(len(n_tok)),
                         where=n_tok > 0)
        return pa.table(
            {"doc_id": b["doc_id"], "n_tokens": pa.array(n_tok, pa.int64()),
             "n_oov": pa.array(n_oov, pa.int64()),
             "rate": pa.array(rate, pa.float64())}
        )

    return docs.map_batches(score, batch_format="pyarrow")


def compression_ratio(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetitiveness signal: per document, the zlib
    compression ratio — (doc_id, n_bytes, n_compressed, ratio). Highly
    repetitive machine-generated text compresses far below fluent prose,
    so pipelines threshold on this before training (Rae et al. 2021 §A1.2
    use the analogous repetition filters). Pure streamed map; zlib level 6
    is deterministic for a given library, and the ratio is int/int
    division. Rows-only: compression is not SQL-expressible — pytest
    checks monotone separation (repetitive << random) and a kernel replay."""
    import zlib

    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bytes", pa.int64()),
         ("n_compressed", pa.int64()), ("ratio", pa.float64())]
    )

    def score(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        raw = [t.encode() for t in b["text"].to_pylist()]
        nb = np.fromiter((len(r) for r in raw), np.int64, count=len(raw))
        nc = np.fromiter(
            (len(zlib.compress(r, 6)) for r in raw), np.int64, count=len(raw)
        )
        ratio = np.divide(nc, nb, out=np.zeros(len(raw)), where=nb > 0)
        return pa.table(
            {"doc_id": ids, "n_bytes": pa.array(nb),
             "n_compressed": pa.array(nc), "ratio": pa.array(ratio)}
        ) if len(raw) else schema.empty_table()

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def char_entropy(sf_dir: str) -> rd.Dataset:
    """Character-distribution Shannon entropy per document — (doc_id,
    n_chars_used, entropy_bits). Near-zero entropy flags degenerate
    single-character floods; unusually high entropy flags binary/garbage
    pasted into text. One vectorized bincount over uint8 bytes per doc.
    Rows-only (log2 is transcendental); pytest replays the kernel and
    checks the planted extremes."""
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_chars_used", pa.int64()),
         ("entropy_bits", pa.float64())]
    )

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        ids = b["doc_id"]
        used = np.zeros(b.num_rows, np.int64)
        ent = np.zeros(b.num_rows, np.float64)
        for i, t in enumerate(b["text"].to_pylist()):
            raw = np.frombuffer((t or "").encode(), np.uint8)
            if raw.size == 0:
                continue
            counts = np.bincount(raw)
            counts = counts[counts > 0]
            p = counts / raw.size
            used[i] = len(counts)
            ent[i] = float(-(p * np.log2(p)).sum())
        return pa.table(
            {"doc_id": ids, "n_chars_used": pa.array(used),
             "entropy_bits": pa.array(ent)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def self_repetition(sf_dir: str, min_len: int = 10) -> rd.Dataset:
    """Within-document self-repetition — (doc_id, max_repeat_len,
    repeat_ratio): the length of the longest substring occurring at least
    twice inside the doc (0 if shorter than ``min_len``) and its share of
    the text. Catches copy-paste loops and template spam that bigram
    fractions miss (arbitrary-length verbatim blocks). Pure streamed map;
    per-doc cost is O(n log n) binary-searched rolling hash
    (functions/suffix.longest_repeated_substring, collision-verified).
    Rows-only: suffix search is not SQL-expressible — pytest plants
    repeated blocks and replays the kernel."""
    from dedup_ray.functions.suffix import longest_repeated_substring

    schema = pa.schema(
        [("doc_id", pa.int64()), ("max_repeat_len", pa.int64()),
         ("repeat_ratio", pa.float64())]
    )

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        texts = b["text"].to_pylist()
        ln = np.fromiter((len(t or "") for t in texts), np.int64,
                         count=len(texts))
        rep = np.fromiter(
            (longest_repeated_substring(t or "", min_len) for t in texts),
            np.int64, count=len(texts),
        )
        ratio = np.divide(rep, ln, out=np.zeros(len(texts)), where=ln > 0)
        return pa.table(
            {"doc_id": b["doc_id"], "max_repeat_len": pa.array(rep),
             "repeat_ratio": pa.array(ratio)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def lang_length_cume_dist(sf_dir: str) -> rd.Dataset:
    """Per-language cumulative distribution of document length:
    (doc_id, lang, cume) where cume = share of same-language docs with
    length <= this doc's — the grouped percent-normalization window
    (cume_dist PARTITION BY lang). ONE lang shuffle; within each lang run
    the peer-group boundary is one searchsorted of the sorted values
    against themselves; cume is int/int division, bit-identical to the
    oracle."""
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("cume", pa.float64())]
    )

    def cume_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        lang = np.asarray(g["lang"].to_pylist(), dtype=object)
        v = g["n_chars"].to_numpy(zero_copy_only=False)
        starts = run_starts(lang)
        bounds = np.append(starts, len(lang))
        cume = np.empty(len(lang), dtype=np.float64)
        for r in range(len(starts)):  # bounded by the lang domain per bucket
            lo, hi = bounds[r], bounds[r + 1]
            run = v[lo:hi]  # sorted ascending within the run
            le = np.searchsorted(run, run, side="right")
            cume[lo:hi] = le / (hi - lo)
        return pa.table(
            {"doc_id": g["doc_id"], "lang": g["lang"],
             "cume": pa.array(cume)}
        )

    return grouped_runs(docs, "lang", cume_runs,
                        sort_cols=["lang", "n_chars"])


_LANGID_SINGLETON: list = []


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """Language-ID evaluation matrix — (lang, pred_lang, n): the labeled
    ``lang`` column crossed with the trigram-heuristic prediction, the
    standard quality gate for a classifier stage before trusting it to
    route/filter a corpus. Per-batch (label, pred) Arrow partials bound
    each block's output by langs², then one tiny shuffle. Rows-only: the
    trigram profiles are not SQL-expressible; tests/test_analysis.py
    asserts the matrix is diagonal-dominant for seeded languages and
    counts sum to the corpus."""

    def partial(b: pa.Table) -> pa.Table:
        if not _LANGID_SINGLETON:  # per-process cached profiles
            _LANGID_SINGLETON.append(LangId())
        model = _LANGID_SINGLETON[0]
        preds = model(
            pa.table({"doc_id": b["doc_id"], "text": b["text"]})
        )["pred_lang"]
        t = pa.table(
            {"lang": b["lang"], "pred_lang": preds,
             "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        )
        g = t.group_by(["lang", "pred_lang"]).aggregate([("one", "sum")])
        return pa.table(
            {"lang": g["lang"], "pred_lang": g["pred_lang"], "pn": g["one_sum"]}
        )

    agg = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .sum("pn")
    )
    schema = pa.schema(
        [("lang", pa.string()), ("pred_lang", pa.string()), ("n", pa.int64())]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"lang": b["lang"], "pred_lang": b["pred_lang"],
             "n": b["sum(pn)"].cast(pa.int64())}
        )
        if b.num_rows and "sum(pn)" in b.column_names
        else schema.empty_table(),
        batch_format="pyarrow",
    )


def bm25_search(sf_dir: str, k: int = 20) -> pa.Table:
    """BM25 ranked retrieval (Okapi / Robertson-Sparck Jones) for the fixed
    query (merge, window, spark), k1 = 1.5, b = 0.75: the top-``k``
    (doc_id, score) — the relevance-search primitive of every
    retrieval-augmented data pipeline, layered on the same token class as
    ``term_postings`` (the reference builds one report per detector the
    same way, /root/reference/src/report.rs).

    Exact-oracle float parity: k1 and b are exactly binary-representable,
    and BOTH engines evaluate the literal expression tree
    ``idf_t * ((tf*2.5) / (tf + 1.5*(0.25 + 0.75*(dl/(sdl/n)))))`` summed
    left-to-right over the three terms, so the IEEE doubles match the
    DuckDB oracle bit-for-bit (the exact-arithmetic rule: identical ops in
    identical order, ints until the last possible moment).

    Scale shape: pass 1 streams one 5-int partial row per batch (n_docs,
    sum dl, df per query term) — no shuffle; the driver folds them and
    derives 4 scalars (avgdl + 3 idfs) that ship inside the task closure.
    Pass 2 re-streams the corpus, scores matching rows vectorized
    (pyarrow token equality -> bincount tf; one numpy expression), and
    keeps only the top-k per batch, so at most k rows per batch — never
    text, never non-matching docs — reach the driver's bounded final
    merge. Two tokenize passes is the deliberate trade vs caching the
    (doc_id, dl, tf) projection: Ray re-executes lazy lineage per
    consumer, and the stats pass is a fraction of the scoring pass."""
    import math

    import ray

    terms = ("merge", "window", "spark")

    def _tf_dl(text: pa.ChunkedArray | pa.Array):
        la = pc.ascii_split_whitespace(pc.fill_null(text, "")).combine_chunks()
        vals = la.values
        offs = la.offsets.to_numpy().astype(np.int64)
        n = len(offs) - 1
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        if len(vals):
            real = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        else:
            real = np.zeros(0, dtype=bool)
        dl = np.bincount(doc_idx[real], minlength=n).astype(np.int64)
        tfs = []
        for t in terms:
            if len(vals):
                m = pc.equal(vals, t).to_numpy(zero_copy_only=False) & real
                tfs.append(np.bincount(doc_idx[m], minlength=n).astype(np.int64))
            else:
                tfs.append(np.zeros(n, dtype=np.int64))
        return dl, tfs

    def stats_partial(b: pa.Table) -> pa.Table:
        dl, tfs = _tf_dl(b["text"])
        return pa.table(
            {"pn": pa.array([b.num_rows], pa.int64()),
             "pdl": pa.array([int(dl.sum())], pa.int64()),
             "pdf0": pa.array([int((tfs[0] > 0).sum())], pa.int64()),
             "pdf1": pa.array([int((tfs[1] > 0).sum())], pa.int64()),
             "pdf2": pa.array([int((tfs[2] > 0).sum())], pa.int64())}
        )

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    n_total = 0
    sdl = 0
    dfs = [0, 0, 0]
    for t in ray.get(
        docs.map_batches(stats_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "pn" in t.column_names:
            n_total += int(pc.sum(t["pn"]).as_py() or 0)
            sdl += int(pc.sum(t["pdl"]).as_py() or 0)
            for i in range(3):
                dfs[i] += int(pc.sum(t[f"pdf{i}"]).as_py() or 0)

    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.float64())])
    if n_total == 0:
        return out_schema.empty_table()

    avgdl = sdl / n_total  # one int/int division, identical in SQL: sdl/n
    idf = [
        math.log((n_total - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
        for i in range(3)
    ]

    def score_topk(b: pa.Table) -> pa.Table:
        dl, tfs = _tf_dl(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        any_m = (tfs[0] + tfs[1] + tfs[2]) > 0
        if not any_m.any():
            return out_schema.empty_table()
        ids = ids[any_m]
        dl = dl[any_m]
        tf0, tf1, tf2 = (tf[any_m] for tf in tfs)
        # literal expression tree shared verbatim with the SQL oracle
        denom = 1.5 * (0.25 + 0.75 * (dl / avgdl))
        s = (
            idf[0] * ((tf0 * 2.5) / (tf0 + denom))
            + idf[1] * ((tf1 * 2.5) / (tf1 + denom))
            + idf[2] * ((tf2 * 2.5) / (tf2 + denom))
        )
        order = np.lexsort((ids, -s))[:k]
        return pa.table(
            {"doc_id": pa.array(ids[order], pa.int64()),
             "score": pa.array(s[order], pa.float64())}
        )

    parts = [
        t for t in ray.get(
            docs.map_batches(score_topk, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "doc_id" in t.column_names
    ]
    if not parts:
        return out_schema.empty_table()
    merged = pa.concat_tables(parts)
    ids = merged["doc_id"].to_numpy(zero_copy_only=False)
    s = merged["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -s))[:k]
    return pa.table(
        {"doc_id": pa.array(ids[order], pa.int64()),
         "score": pa.array(s[order], pa.float64())}
    )


def boilerplate_ngrams(sf_dir: str, n: int = 5, min_df: int = 2) -> rd.Dataset:
    """Cross-document repeated word n-grams — (ngram, df) for every
    n-token window appearing in at least ``min_df`` DISTINCT documents:
    the boilerplate census (headers, license blurbs, templated spans)
    that C4/Gopher-style curation uses to decide what to strip, and the
    direct signal behind exact-substring train-set dedup.

    Shape: each doc is one row, so n-gram construction is local to the
    scan task — ONE ``binary_join_element_wise`` over n shifted slices of
    the flattened token values builds every window string vectorized (no
    per-row Python); a windows whose span crosses a doc boundary is
    masked out via the repeated doc index. Distinct-per-doc then a
    per-batch Arrow group_by collapse to (ngram, partial_df) partials, so
    the single ngram-key shuffle that merges them moves at most one row
    per distinct ngram per batch — at 100 TB the HAVING>=min_df cut means
    the unbounded singleton tail never reaches the driver (the result
    stays a streamed Dataset). Reference analog: the size/hash grouping
    census (src/grouping.rs HAVING>=2) applied to text windows."""
    part_schema = pa.schema([("ngram", pa.string()), ("pn", pa.int64())])
    out_schema = pa.schema([("ngram", pa.string()), ("df", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text" not in b.column_names:
            return part_schema.empty_table()
        la = pc.ascii_split_whitespace(b["text"]).combine_chunks()
        toks = la.values
        offs = la.offsets.to_numpy().astype(np.int64)
        total = len(toks)
        if total < n:
            return part_schema.empty_table()
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(offs))
        # window j is valid iff its last token is in the same doc
        starts = np.arange(total - n + 1, dtype=np.int64)
        valid = doc_idx[starts] == doc_idx[starts + n - 1]
        starts = starts[valid]
        if len(starts) == 0:
            return part_schema.empty_table()
        cols = [toks.take(pa.array(starts + i, pa.int64())) for i in range(n)]
        grams = pc.binary_join_element_wise(*cols, " ")
        dist = (
            pa.table({"d": pa.array(doc_idx[starts], pa.int64()), "g": grams})
            .group_by(["d", "g"]).aggregate([])  # distinct (doc, ngram)
        )
        agg = dist.group_by("g").aggregate(
            [("d", "count", pc.CountOptions(mode="all"))]
        )
        return pa.table(
            {"ngram": agg["g"], "pn": agg["d_count"].cast(pa.int64())}
        )

    merged = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .sum("pn")
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return out_schema.empty_table()
        df = b["sum(pn)"].cast(pa.int64())
        keep = pc.greater_equal(df, min_df)
        return pa.table({"ngram": b["ngram"], "df": df}).filter(keep)

    return merged.map_batches(final, batch_format="pyarrow")


def vocab_coverage(sf_dir: str, ks: tuple = (10, 100, 1000)) -> pa.Table:
    """Vocabulary coverage curve — for each k, the share of ALL token
    occurrences covered by the k most frequent terms: (k, covered, total,
    share). The tokenizer-budget planning signal: a corpus where the top
    1000 terms cover 95% packs small vocabularies well; a flat curve says
    spend budget on subwords.

    Same bounded-vocab df pre-pass as top_terms (per-batch value_counts
    partials, ONE tiny token groupby merge — at an unbounded real
    vocabulary the documented swap is a Misra-Gries top-k sketch + exact
    recount, heavy_hitter_users' shape, which bounds state at any scale);
    the curve finish is a driver-side sort + cumsum over the merged vocab
    (count desc, token asc tiebreak, shared with the oracle). Exact int64
    counts; the single share division is double/double on both sides."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.schema(
                [("token", pa.string()), ("pn", pa.int64())]
            ).empty_table()
        flat = pc.list_flatten(pc.ascii_split_whitespace(b["text"]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"),
             "pn": vc.field("counts").cast(pa.int64())}
        )

    docs = _docs(sf_dir, columns=["text"])
    parts = [
        t for t in ray.get(
            docs.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "token" in t.column_names
    ]
    out_schema = pa.schema(
        [("k", pa.int64()), ("covered", pa.int64()), ("total", pa.int64()),
         ("share", pa.float64())]
    )
    if not parts:
        return out_schema.empty_table()
    m = (
        pa.concat_tables(parts).group_by("token").aggregate([("pn", "sum")])
    )
    cnt = m["pn_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    tok = np.asarray(m["token"].to_pylist(), dtype=object)
    order = np.lexsort((tok, -cnt))
    csum = np.cumsum(cnt[order])
    total = int(csum[-1])
    rows_k, rows_c = [], []
    for k in ks:
        kk = min(int(k), len(csum))
        rows_k.append(int(k))
        rows_c.append(int(csum[kk - 1]) if kk > 0 else 0)
    return pa.table(
        {"k": pa.array(rows_k, pa.int64()),
         "covered": pa.array(rows_c, pa.int64()),
         "total": pa.array([total] * len(rows_k), pa.int64()),
         "share": pa.array([c / total for c in rows_c], pa.float64())}
    )


def lang_source_chi2_cells(sf_dir: str) -> pa.Table:
    """Per-cell chi-squared independence contributions for the lang x
    source contingency table: (lang, source, observed, expected,
    chi2_cell) over the full cross product of observed margins (absent
    joint cells count o=0, as the test requires). The corpus-balance
    audit: a large cell says that language leans on that source — the
    statistical-test companion to lang_source_matrix's raw counts.

    Scale shape: NO shuffle — per-batch Arrow hash-agg (lang, source)
    count partials fold driver-side (state bounded by |langs|·|sources|);
    margins and the statistic derive from that table. Exact parity: both
    engines compute expected = r·c/n and chi2_cell = (o·n − r·c)² /
    (n·r·c) as SINGLE divisions of exactly-computed integers (Python
    unbounded ints here, HUGEINT in the oracle)."""
    import ray

    part_schema = pa.schema(
        [("lang", pa.string()), ("source", pa.string()),
         ("o", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lang" not in b.column_names:
            return part_schema.empty_table()
        g = b.select(["lang", "source"]).group_by(
            ["lang", "source"]
        ).aggregate([("lang", "count")])
        return pa.table(
            {"lang": g["lang"], "source": g["source"],
             "o": g["lang_count"].cast(pa.int64())}
        )

    docs = _docs(sf_dir, columns=["lang", "source"])
    obs: dict[tuple, int] = {}
    for t in ray.get(
        docs.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows == 0 or "lang" not in t.column_names:
            continue
        for l_, s_, o_ in zip(
            t["lang"].to_pylist(), t["source"].to_pylist(),
            t["o"].to_pylist(),
        ):
            obs[(l_, s_)] = obs.get((l_, s_), 0) + o_
    out_schema = pa.schema(
        [("lang", pa.string()), ("source", pa.string()),
         ("observed", pa.int64()), ("expected", pa.float64()),
         ("chi2_cell", pa.float64())]
    )
    if not obs:
        return out_schema.empty_table()
    rl: dict[str, int] = {}
    cs: dict[str, int] = {}
    for (l_, s_), o_ in obs.items():
        rl[l_] = rl.get(l_, 0) + o_
        cs[s_] = cs.get(s_, 0) + o_
    n = sum(obs.values())
    langs, srcs, os_, exp, chi = [], [], [], [], []
    for l_ in sorted(rl):
        for s_ in sorted(cs):
            o_ = obs.get((l_, s_), 0)
            rc = rl[l_] * cs[s_]
            langs.append(l_)
            srcs.append(s_)
            os_.append(o_)
            exp.append(float(rc) / float(n))
            d = o_ * n - rc
            chi.append(float(d * d) / float(n * rc))
    return pa.table(
        {"lang": pa.array(langs, pa.string()),
         "source": pa.array(srcs, pa.string()),
         "observed": pa.array(os_, pa.int64()),
         "expected": pa.array(exp, pa.float64()),
         "chi2_cell": pa.array(chi, pa.float64())}
    )
