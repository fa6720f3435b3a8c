"""langid_confusion: mechanical invariants on the driver corpus (whose text
is synthetic pseudo-words — labels are NOT recoverable there) plus a
seeded-language fixture where the diagonal must be perfect."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_langid_confusion_totals_and_domain():
    from dedup_ray.pipelines.analysis import LangId, langid_confusion

    sf = "/root/testdata/sf0.001"
    df = langid_confusion(sf).to_pandas()
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert df["n"].sum() == n
    assert (df["n"] > 0).all()
    assert set(df["pred_lang"]) <= set(LangId.SEEDS) | {"und"}


def test_langid_confusion_perfect_on_seed_sentences(tmp_path):
    from dedup_ray.pipelines.analysis import LangId, langid_confusion

    rows = []
    for i, (lang, seed) in enumerate(sorted(LangId.SEEDS.items())):
        for j in range(3):  # three shifted variants per language
            rows.append((i * 3 + j, seed + " " + seed[j * 2 :], lang))
    t = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string()),
         "lang": pa.array([r[2] for r in rows], pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = langid_confusion(str(tmp_path)).to_pandas()
    assert (df["lang"] == df["pred_lang"]).all(), df
    assert df["n"].sum() == len(rows)
