"""Planted-input behavior for the analysis keyword/ntile operators
(oracle parity at sf0.001 is covered by test_queries; these exercise
shapes the synthetic corpus cannot: forced ties, empty docs, remainders)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.pipelines import analysis


def _write_docs(tmp_path, rows) -> str:
    """rows: list of (doc_id, text). Shapes a documents.parquet."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_rarest_term_planted(tmp_path):
    rows = [
        (0, "common common unique0 shared"),   # unique0 has df=1
        (1, "common shared zzz"),              # zzz df=1 (tie broken vs nothing)
        (2, "common aaa zzz"),                 # aaa and zzz... aaa df=1, zzz df=2
        (3, ""),                               # tokenless doc: absent
        (4, "common common common"),           # only common (df=4)
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: (r["term"], r["df"])
           for r in analysis.rarest_term_per_doc(sf).take_all()}
    assert got[0] == ("unique0", 1)
    assert got[2] == ("aaa", 1)
    assert 3 not in got
    assert got[4] == ("common", 4)
    # doc 1: candidates common(4), shared(2), zzz(2) -> min df=2, tie 'shared'<'zzz'
    assert got[1] == ("shared", 2)


def test_rarest_term_tie_breaks_lexically(tmp_path):
    sf = _write_docs(tmp_path, [(0, "beta alpha"), (1, "beta alpha")])
    got = {r["doc_id"]: (r["term"], r["df"])
           for r in analysis.rarest_term_per_doc(sf).take_all()}
    assert got == {0: ("alpha", 2), 1: ("alpha", 2)}


def test_length_quartiles_matches_ntile(tmp_path):
    # 10 docs, lengths with heavy ties; n=10, 4 buckets -> sizes 3,3,2,2
    rows = [(i, "x" * ln) for i, ln in
            enumerate([5, 5, 5, 5, 2, 2, 9, 9, 9, 1])]
    sf = _write_docs(tmp_path, rows)
    got = {r["doc_id"]: r["quartile"]
           for r in analysis.length_quartiles(sf).take_all()}
    # ntile(4) ORDER BY (n_chars, doc_id):
    # rank order: doc9(1), doc4(2), doc5(2), doc0(5), doc1(5), doc2(5),
    #             doc3(5), doc6(9), doc7(9), doc8(9)
    want_order = [9, 4, 5, 0, 1, 2, 3, 6, 7, 8]
    sizes = [3, 3, 2, 2]
    want = {}
    i = 0
    for q, s in enumerate(sizes, start=1):
        for _ in range(s):
            want[want_order[i]] = q
            i += 1
    assert got == want


def test_length_quartiles_fewer_rows_than_buckets(tmp_path):
    sf = _write_docs(tmp_path, [(0, "ab"), (1, "a")])
    got = {r["doc_id"]: r["quartile"]
           for r in analysis.length_quartiles(sf).take_all()}
    assert got == {1: 1, 0: 2}  # ntile gives each row its own bucket


def test_length_quartiles_null_lengths_excluded(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["aa", "b", "cccc", "dd"], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([2, 1, None, 2], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = {r["doc_id"]: r["quartile"]
           for r in analysis.length_quartiles(str(tmp_path)).take_all()}
    # null-length doc 2 is outside the rank domain (count(n_chars) semantics)
    assert got == {1: 1, 0: 2, 3: 3}


def test_dup_ngrams_all_singleton_buckets_schema(tmp_path):
    """Every shingle unique -> every merge bucket emits an empty table.
    The kernel's own empties carry the (string, int64) schema (never
    null-typed); Ray's map_groups additionally emits schema-LESS empties
    for empty sort partitions (engine-wide, tolerated), so the end-to-end
    assertion here is: no crash, zero rows, and any typed block is
    correctly typed."""
    import ray

    from dedup_ray.pipelines import curation

    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h w{i}i", "s")
            for i in range(6)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    ds = curation.dup_ngrams(str(tmp_path), k=8)
    blocks = ray.get(ds.to_arrow_refs())
    assert sum(b.num_rows for b in blocks) == 0
    typed = [b for b in blocks if b.num_columns]
    assert all(
        [f.name for f in b.schema] == ["shingle", "n_docs"]
        and b.schema.field("shingle").type == "string"
        for b in typed
    )


def test_phash_hamming_search_planted(tmp_path):
    from dedup_ray.pipelines.neardup import phash_hamming_search

    base = 0x0123456789ABCDEF
    rows = [
        ("a_query", base),
        ("b_dist1", base ^ 0b1),            # dist 1 -> hit
        ("c_dist6", base ^ 0x3F),           # dist 6 -> hit (boundary)
        ("d_dist7", base ^ 0x7F),           # dist 7 -> miss
        ("e_exact", base),                  # dist 0 -> hit (self excluded by id)
    ]
    t = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "phash": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "imgs.parquet")
    out = phash_hamming_search(str(tmp_path / "imgs.parquet"), n_queries=1)
    got = {(r["query_id"], r["image_id"]): r["dist"] for r in out.take_all()}
    assert got == {
        ("a_query", "b_dist1"): 1,
        ("a_query", "c_dist6"): 6,
        ("a_query", "e_exact"): 0,
    }


def test_doc_jaccard_search_planted(tmp_path):
    from dedup_ray.pipelines.text import doc_jaccard_search

    rows = [
        (0, "alpha beta gamma delta"),         # the query
        (1, "alpha beta gamma delta"),         # jacc 1.0
        (2, "alpha beta gamma epsilon"),       # 3/5 = 0.6
        (3, "alpha zeta eta theta"),           # 1/7 -> miss
        (4, ""),                               # tokenless: excluded
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = doc_jaccard_search(str(tmp_path), n_queries=1, threshold=0.5)
    got = {(r["query_id"], r["doc_id"]): r["jacc"] for r in out.take_all()}
    assert got == {(0, 1): 1.0, (0, 2): 0.6}


def test_df_histogram_planted(tmp_path):
    sf = _write_docs(tmp_path, [
        (0, "a b c"),      # a in 3 docs, b in 2, c in 1
        (1, "a b"),
        (2, "a d d d"),    # d repeated IN one doc counts once
    ])
    got = {r["df"]: r["n_terms"]
           for r in analysis.df_histogram(sf).take_all()}
    assert got == {1: 2, 2: 1, 3: 1}  # {c,d}=1, {b}=2, {a}=3
