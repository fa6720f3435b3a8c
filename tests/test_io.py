"""IO seam: read_view must strip pandas schema metadata at the read (the
metadata blob makes pyarrow Schema.__hash__ raise inside Ray's block concat
— round-2 'Failed to hash the schemas' fix) and still honor projection."""

import os

import pandas as pd
import pyarrow.parquet as pq
import ray

from dedup_ray.sources.io import read_view


def _pandas_parquet(tmp_path) -> str:
    path = os.path.join(str(tmp_path), "t.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(path)
    assert pq.read_schema(path).metadata  # pandas wrote its metadata blob
    return path


def test_read_view_strips_schema_metadata(tmp_path):
    ds = read_view(_pandas_parquet(tmp_path))
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        assert not t.schema.metadata
        hash(t.schema)  # must not raise


def test_read_view_projection(tmp_path):
    ds = read_view(_pandas_parquet(tmp_path), columns=["a"])
    got = ds.to_pandas()
    assert list(got.columns) == ["a"]
    assert got["a"].tolist() == [1, 2, 3]


def test_read_view_jsonl_and_csv(tmp_path, ray_session):
    """Documents-style corpora arrive as JSONL/CSV too: read_view must
    dispatch on extension and still apply projection."""
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedup_ray.sources.io import read_view

    rows = [
        {"doc_id": i, "text": f"doc number {i}", "lang": "en", "n_chars": 12 + i}
        for i in range(50)
    ]
    jl = tmp_path / "docs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    cs = tmp_path / "docs.csv"
    pd.DataFrame(rows).to_csv(cs, index=False)
    p = tmp_path / "docs.parquet"
    pq.write_table(pa.Table.from_pylist(rows), p)

    want = read_view(str(p), columns=["doc_id", "text"]).to_pandas().sort_values("doc_id")
    for path in (jl, cs):
        got = read_view(str(path), columns=["doc_id", "text"]).to_pandas().sort_values("doc_id")
        assert list(got.columns) == ["doc_id", "text"]
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True)), path


def test_read_view_predicate_pushdown(tmp_path, ray_session):
    """predicate= filters at the scan for parquet and post-read for JSONL;
    both must return the same rows as an in-memory filter."""
    import json

    import pyarrow.dataset as pads

    path = os.path.join(str(tmp_path), "p.parquet")
    df = pd.DataFrame({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    df.to_parquet(path, row_group_size=10)
    pred = pads.field("a") >= 73
    got = read_view(path, predicate=pred).to_pandas().sort_values("a")
    assert got["a"].tolist() == list(range(73, 100))

    jpath = os.path.join(str(tmp_path), "p.jsonl")
    with open(jpath, "w") as f:
        for _, row in df.iterrows():
            f.write(json.dumps({"a": int(row.a), "b": row.b}) + "\n")
    gotj = read_view(jpath, columns=["a"], predicate=pred).to_pandas().sort_values("a")
    assert gotj["a"].tolist() == list(range(73, 100))


def test_read_view_predicate_on_unprojected_column(tmp_path, ray_session):
    """A predicate may reference columns outside the projection — parquet
    and JSONL must both filter on them and emit only the projected columns."""
    import json

    import pyarrow.dataset as pads

    df = pd.DataFrame({"a": list(range(50)), "b": [i * 2 for i in range(50)]})
    ppath = os.path.join(str(tmp_path), "u.parquet")
    df.to_parquet(ppath, row_group_size=10)
    pred = pads.field("b") >= 80
    got = read_view(ppath, columns=["a"], predicate=pred).to_pandas()
    assert sorted(got.columns) == ["a"]
    assert sorted(got["a"].tolist()) == list(range(40, 50))

    jpath = os.path.join(str(tmp_path), "u.jsonl")
    with open(jpath, "w") as f:
        for _, row in df.iterrows():
            f.write(json.dumps({"a": int(row.a), "b": int(row.b)}) + "\n")
    gotj = read_view(jpath, columns=["a"], predicate=pred).to_pandas()
    assert sorted(gotj.columns) == ["a"]
    assert sorted(gotj["a"].tolist()) == list(range(40, 50))


def test_export_partitioned_resume_skip(tmp_path, ray_session):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd
    from dedup_ray.sources.export import export_partitioned

    t = pa.table(
        {
            "doc_id": pa.array(range(1000), type=pa.int64()),
            "v": pa.array([i * 7 % 13 for i in range(1000)], type=pa.int64()),
        }
    )
    out = str(tmp_path / "exp")
    ds = rd.from_arrow(t).repartition(6)
    s1 = export_partitioned(ds, out, key="doc_id", num_partitions=8)
    assert s1["partitions_skipped"] == 0
    assert s1["rows"] == 1000

    # read-back: every row present exactly once
    files = sorted(glob.glob(out + "/part=*/data.parquet"))
    assert len(files) == s1["partitions_written"]
    back = pa.concat_tables([pq.read_table(f) for f in files])
    assert back.num_rows == 1000
    assert sorted(back["doc_id"].to_pylist()) == list(range(1000))

    # resume: everything skips
    s2 = export_partitioned(ds, out, key="doc_id", num_partitions=8)
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == s1["partitions_written"]

    # torn partition (marker removed) is rewritten, others still skip
    victim = os.path.dirname(files[0])
    os.remove(os.path.join(victim, "_SUCCESS"))
    s3 = export_partitioned(ds, out, key="doc_id", num_partitions=8)
    assert s3["partitions_written"] == 1
    assert s3["partitions_skipped"] == s1["partitions_written"] - 1
    back = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(out + "/part=*/data.parquet"))]
    )
    assert back.num_rows == 1000


def test_export_partitioned_sweeps_torn_tmp_and_rejects_config_change(
    tmp_path, ray_session
):
    import glob

    import pyarrow as pa
    import pytest

    import ray.data as rd
    from dedup_ray.sources.export import export_partitioned

    t = pa.table(
        {"doc_id": pa.array(range(200), type=pa.int64()),
         "v": pa.array(range(200), type=pa.int64())}
    )
    out = str(tmp_path / "exp2")
    ds = rd.from_arrow(t).repartition(3)
    export_partitioned(ds, out, key="doc_id", num_partitions=4)

    # plant a torn tmp dir (crashed attempt, even with a marker inside):
    # it must be swept, never crash the resume, never match part=* globs
    torn = os.path.join(out, "part=0002.tmp.99999")
    os.makedirs(torn)
    with open(os.path.join(torn, "_SUCCESS"), "w") as f:
        f.write("junk")
    with open(os.path.join(torn, "data.parquet"), "w") as f:
        f.write("not parquet")
    s = export_partitioned(ds, out, key="doc_id", num_partitions=4)
    assert s["partitions_written"] == 0
    assert not glob.glob(out + "/part=*.tmp.*")

    # a different partitioning config must be rejected, not mixed in
    with pytest.raises(ValueError, match="hashing schemes"):
        export_partitioned(ds, out, key="doc_id", num_partitions=8)
    with pytest.raises(ValueError, match="hashing schemes"):
        export_partitioned(ds, out, key="v", num_partitions=4)
