"""attach_pair_attrs: broadcast vs shuffle-join strategies must agree."""

import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.stages.join import attach_pair_attrs


@pytest.fixture()
def pairs_and_attrs():
    pairs = rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array(["a", "a", "b"]),
                "dst_id": pa.array(["b", "c", "c"]),
            }
        )
    )
    attrs = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["a", "b", "c", "d"]),
                "phash": pa.array([10, 20, 30, 40], type=pa.int64()),
                "caption": pa.array(["ca", "cb", "cc", "cd"]),
            }
        )
    )
    return pairs, attrs


def _canon(df):
    return df.sort_values(["src_id", "dst_id"]).reset_index(drop=True)


def test_broadcast_attach(pairs_and_attrs):
    pairs, attrs = pairs_and_attrs
    out = _canon(
        attach_pair_attrs(pairs, attrs, ["phash", "caption"]).to_pandas()
    )
    assert out.loc[0, "src_phash"] == 10 and out.loc[0, "dst_phash"] == 20
    assert out.loc[2, "src_caption"] == "cb" and out.loc[2, "dst_caption"] == "cc"


def test_shuffle_join_attach_matches_broadcast(pairs_and_attrs):
    pairs, attrs = pairs_and_attrs
    want = _canon(attach_pair_attrs(pairs, attrs, ["phash", "caption"]).to_pandas())
    got = _canon(
        attach_pair_attrs(
            pairs, attrs, ["phash", "caption"], broadcast_max_rows=0, num_partitions=2
        ).to_pandas()
    )
    cols = ["src_id", "dst_id", "src_phash", "dst_phash", "src_caption", "dst_caption"]
    assert got[cols].equals(want[cols])
