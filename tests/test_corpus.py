"""Corpus generator: determinism, schema contract, ground-truth consistency
(~ the reference generator's seeded reproducibility, benchmark/generator.py)."""

import json
import os

import pyarrow.parquet as pq

from dedup_ray.sources.corpus import CorpusSpec, generate_corpus, materialize_rows, plan_corpus

EXPECTED_SCHEMA = {
    "image_id": "string",
    "bytes": "binary",
    "w": "int32",
    "h": "int32",
    "fmt": "string",
    "caption": "string",
    "phash": "int64",
}


def test_schema_matches_input_hint(tiny_corpus):
    # images.parquet is a DIRECTORY of part files (read-parallelism layout)
    s = pq.ParquetDataset(os.path.join(tiny_corpus, "images.parquet")).schema
    assert {n: str(s.field(n).type) for n in s.names if n in EXPECTED_SCHEMA} == EXPECTED_SCHEMA
    assert set(s.names) == set(EXPECTED_SCHEMA)


def test_deterministic_regeneration(tmp_path, tiny_corpus):
    out2 = str(tmp_path / "again")
    generate_corpus(out2, scale="tiny", use_ray=False)
    a = pq.read_table(os.path.join(tiny_corpus, "images.parquet"))
    b = pq.read_table(os.path.join(out2, "images.parquet"))
    assert a.equals(b)


def test_metadata_consistent_with_gt(tiny_corpus):
    with open(os.path.join(tiny_corpus, "metadata.json")) as f:
        meta = json.load(f)
    gt = pq.read_table(os.path.join(tiny_corpus, "gt_clusters.parquet")).to_pandas()
    sizes = gt.groupby("gt_cluster_id").size()
    assert meta["total_rows"] == len(gt)
    assert meta["rows_in_dup_groups"] == int(sizes[sizes >= 2].sum())
    assert meta["dup_groups"] == int((sizes >= 2).sum())


def test_plan_materialize_pure_function():
    spec = CorpusSpec(n_rows=50)
    plan = plan_corpus(spec)
    t1 = materialize_rows(plan, spec)
    t2 = materialize_rows(plan, spec)
    assert t1.equals(t2)
    # slicing the plan (distributed batching) yields the same rows
    t3 = materialize_rows(plan.slice(10, 5), spec)
    assert t3.equals(t1.slice(10, 5))


def test_hot_empty_caption_rows_are_singletons(tiny_corpus):
    gt = pq.read_table(os.path.join(tiny_corpus, "gt_clusters.parquet")).to_pandas()
    empties = gt[gt.dup_class == "hot_empty_caption"]
    if len(empties):
        # each maps to its own cluster
        assert (empties.gt_cluster_id == empties.image_id).all()


def test_stale_single_file_corpus_regenerates(tmp_path):
    """A stale cache from the pre-directory layout (images.parquet as a
    FILE) plus an old config hash must regenerate cleanly, not crash on the
    directory rename."""
    import json
    import os

    from dedup_ray.sources.corpus import generate_corpus

    out = str(tmp_path / "corpus")
    os.makedirs(out)
    with open(os.path.join(out, "images.parquet"), "wb") as f:
        f.write(b"old single-file corpus")
    with open(os.path.join(out, "metadata.json"), "w") as f:
        json.dump({"config_hash": "old-v1"}, f)
    meta = generate_corpus(out, scale="tiny", use_ray=False)
    assert os.path.isdir(os.path.join(out, "images.parquet"))
    assert meta["total_rows"] == 200
