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

def _docs(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from dedup_ray.sources.io import read_view

    return read_view(f"{sf_dir}/documents.parquet", columns=columns)


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
