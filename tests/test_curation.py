"""Curation operators: planted-PII redaction, normalization edge cases,
decontamination hits/misses, repetition scoring, packing invariants.
Oracle parity for the SQL-checked five is covered by test_queries /
tools/check_oracle.py; these tests exercise the cases the synthetic
corpus cannot (real PII shapes, messy whitespace, oversize docs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedup_ray.pipelines import curation

DOCS_SCHEMA = ["doc_id", "text", "lang", "source", "n_chars"]


def _write_docs(tmp_path, rows) -> str:
    """rows: list of (doc_id, text, source). Shapes a documents.parquet."""
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def test_pii_redact_planted(tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "mail me at jo.doe+x@ex-ample.co.uk or call +1 (555) 123-4567 ok", "s"),
            (1, "no pii here at all", "s"),
            (2, "two mails a@b.io c@d.org and 12345678 digits", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in curation.pii_redact(sf).take_all()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> or call <PHONE> ok"
    assert out[0]["n_redactions"] == 2
    assert out[1]["clean_text"] == "no pii here at all"
    assert out[1]["n_redactions"] == 0
    assert out[2]["clean_text"] == "two mails <EMAIL> <EMAIL> and <PHONE> digits"
    assert out[2]["n_redactions"] == 3


def test_normalize_text_messy(tmp_path):
    sf = _write_docs(
        tmp_path,
        [(0, "  MiXed\t\tCASE \n lines\r\n here  ", "s"), (1, "", "s")],
    )
    out = {r["doc_id"]: r["norm_text"] for r in curation.normalize_text(sf).take_all()}
    assert out[0] == "mixed case lines here"
    assert out[1] == ""


def test_decontaminate_hits_only_true_overlap(tmp_path):
    # doc 10 shares a 5-gram with the eval doc; doc 11 shares only 4 tokens
    sf = _write_docs(
        tmp_path,
        [
            (0, "alpha beta gamma delta epsilon zeta", "src0"),  # eval
            (10, "xx alpha beta gamma delta epsilon yy", "train"),
            (11, "alpha beta gamma delta STOP epsilon zeta", "train"),
            (12, "completely different words entirely here now", "train"),
        ],
    )
    out = {r["doc_id"]: r["n_matched"] for r in
           curation.decontaminate_docs(sf).take_all()}
    assert out == {10: 1}


def test_dup_bigram_fraction_edges(tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (0, "a b a b a b", "s"),   # bigrams: ab ba ab ba ab -> 2/5 distinct
            (1, "one", "s"),           # <2 tokens -> 0 bigrams, frac 0
            (2, "", "s"),
            (3, "w x y z", "s"),       # all distinct -> frac 0
        ],
    )
    out = {r["doc_id"]: r for r in curation.dup_bigram_fraction(sf).take_all()}
    assert out[0]["n_bigrams"] == 5 and out[0]["dup_frac"] == pytest.approx(1 - 2 / 5)
    assert out[1]["n_bigrams"] == 0 and out[1]["dup_frac"] == 0.0
    assert out[2]["n_bigrams"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_pack_sequences_invariants(tmp_path):
    # 40 docs with 1..40 tokens each, including one oversize doc
    rows = [(i, " ".join(["tok"] * n), "s") for i, n in
            enumerate([*range(1, 40), 500])]
    sf = _write_docs(tmp_path, rows)
    out = curation.pack_sequences(sf, budget=64, num_parts=4).take_all()
    assert len(out) == 40  # every doc assigned exactly once
    assert len({r["doc_id"] for r in out}) == 40
    by_bin: dict[int, list[dict]] = {}
    for r in out:
        assert r["part"] == r["doc_id"] % 4
        assert r["bin_id"] // 1_000_000 == r["part"]
        by_bin.setdefault(r["bin_id"], []).append(r)
    for members in by_bin.values():
        total = sum(m["n_tokens"] for m in members)
        # budget respected unless the bin is a single oversize doc
        assert total <= 64 or len(members) == 1
    # greedy in doc_id order within a partition: bin ids are monotone in
    # doc_id, and a doc never skips a bin that still had room for it
    for p in range(4):
        mine = sorted((r for r in out if r["part"] == p), key=lambda r: r["doc_id"])
        bins = [r["bin_id"] for r in mine]
        assert bins == sorted(bins)
        fill = {}
        for r in mine:
            fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tokens"]
        ordered = sorted(fill)
        for prev, cur in zip(ordered, ordered[1:]):
            first_in_cur = next(r["n_tokens"] for r in mine if r["bin_id"] == cur)
            assert fill[prev] + first_in_cur > 64  # cur's opener didn't fit in prev


def test_cap_per_source_ranks(tmp_path):
    rows = [(i, f"doc {i}", f"s{i % 3}") for i in range(20)]
    sf = _write_docs(tmp_path, rows)
    out = curation.cap_per_source(sf, cap=2).take_all()
    got = sorted((r["source"], r["doc_id"], r["rnk"]) for r in out)
    assert got == [
        ("s0", 0, 1), ("s0", 3, 2),
        ("s1", 1, 1), ("s1", 4, 2),
        ("s2", 2, 1), ("s2", 5, 2),
    ]


def test_distinct_users_exact_vs_hll():
    from dedup_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    exact = {r["event_type"]: r["n_users"]
             for r in relational.distinct_users_by_type(sf).take_all()}
    approx = {r["event_type"]: r["n_users_approx"]
              for r in relational.approx_distinct_users(sf).take_all()}
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.06, (et, n, approx[et])


def test_hll_registers_merge_associative():
    import numpy as np

    from dedup_ray.pipelines.relational import _hll_estimate, _hll_registers

    rng = np.random.default_rng(7)
    a = rng.integers(0, 10**9, 5000, dtype=np.int64)
    b = rng.integers(0, 10**9, 5000, dtype=np.int64)
    merged = np.maximum(_hll_registers(a, 10), _hll_registers(b, 10))
    whole = _hll_registers(np.concatenate([a, b]), 10)
    assert (merged == whole).all()
    true_n = len(np.unique(np.concatenate([a, b])))
    assert abs(_hll_estimate(whole) - true_n) / true_n < 0.10


def test_splitmix64_reference_values():
    """Known-answer vectors (cross-checked against the DuckDB HUGEINT
    oracle in __ray_entry__._smix_ctes during development)."""
    from dedup_ray.functions.hashing import splitmix64

    got = splitmix64(np.array([0, 1, 12345, 2**63 - 1], dtype=np.int64))
    assert got.tolist() == [
        16294208416658607535, 10451216379200822465,
        2454886589211414944, 3055647633038352039,
    ]


def test_hash_split_deterministic_and_complete(tmp_path):
    rows = [(i, f"doc {i} text", f"s{i % 3}") for i in range(400)]
    sf = _write_docs(tmp_path, rows)
    out = {r["doc_id"]: r["split"] for r in curation.hash_split_docs(sf).take_all()}
    assert len(out) == 400  # every doc assigned exactly once
    again = {r["doc_id"]: r["split"] for r in curation.hash_split_docs(sf).take_all()}
    assert out == again  # pure function of the id
    frac = sum(1 for s in out.values() if s == "train") / len(out)
    assert 0.8 < frac < 0.97  # ~90% train at n=400
    assert set(out.values()) <= {"train", "val", "test"}


def test_sample_per_source_deterministic_subset(tmp_path):
    rows = [(i, f"text {i}", f"s{i % 4}") for i in range(200)]
    sf = _write_docs(tmp_path, rows)
    got = [(r["source"], r["doc_id"])
           for r in curation.sample_per_source(sf, k=7).take_all()]
    # exactly k per source (every source has 50 >= 7 docs), all real members
    from collections import Counter

    by_src = Counter(s for s, _ in got)
    assert by_src == {f"s{j}": 7 for j in range(4)}
    assert all(d % 4 == int(s[1]) for s, d in got)
    # matches the brute-force rank by (splitmix64(id), id)
    from dedup_ray.functions.hashing import splitmix64

    ids = np.arange(200, dtype=np.int64)
    h = splitmix64(ids)
    expect = set()
    for j in range(4):
        members = ids[ids % 4 == j]
        order = np.lexsort((members, h[ids % 4 == j]))
        expect |= {(f"s{j}", int(d)) for d in members[order][:7]}
    assert set(got) == expect
    # k larger than the group emits the whole group, no padding
    (tmp_path / "b").mkdir()
    small = _write_docs(tmp_path / "b", [(0, "a", "x"), (1, "b", "x")])
    assert len(curation.sample_per_source(small, k=10).take_all()) == 2


def test_dup_ngrams_planted_passage(tmp_path):
    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    rows = [
        (0, "intro words here " + passage, "a"),
        (1, passage + " trailing tail words", "b"),
        (2, "completely different text with no shared passage at all okay", "c"),
        (3, "repeat repeat repeat repeat repeat repeat repeat repeat repeat", "d"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["shingle"]: r["n_docs"] for r in curation.dup_ngrams(sf, k=8).take_all()}
    # the 10-token passage yields 3 shared 8-gram shingles, each in docs 0+1
    shared = [" ".join(passage.split()[i:i + 8]) for i in range(3)]
    for s in shared:
        assert got.get(s) == 2, (s, got)
    # doc 3's internal repetition is ONE doc — never reported
    assert all(n >= 2 for n in got.values())
    assert not any("repeat" in s for s in got)
    assert set(got) == set(shared)


def test_remove_dup_passages_planted(tmp_path, ray_session):
    """Planted shared passage: the keeper (min doc_id) keeps it, every other
    doc loses exactly the covered tokens; overlapping occurrences merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.pipelines.curation import remove_dup_passages

    passage = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly k=8 tokens
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    f"alpha {passage} beta",          # keeper: untouched
                    f"start {passage} end",           # loses the 8 tokens
                    "totally unique words here",       # untouched
                    f"{passage} x {passage}",          # loses both occurrences
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["src0"] * 4),
            "n_chars": pa.array([1, 1, 1, 1], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (
        remove_dup_passages(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.clean_text.tolist() == [
        f"alpha {passage} beta",
        "start end",
        "totally unique words here",
        "x",
    ]
    assert out.n_removed.tolist() == [0, 8, 0, 16]
