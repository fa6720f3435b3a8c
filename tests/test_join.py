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


# --- big-big co-partitioned shuffle_join ------------------------------------


def _join_sides():
    import numpy as np

    rng = np.random.default_rng(7)
    lkeys = rng.integers(0, 40, size=200)  # duplicate keys on BOTH sides
    rkeys = rng.integers(0, 50, size=300)  # some right keys match nothing
    left = pa.table(
        {
            "k": pa.array(lkeys, type=pa.int64()),
            "lval": pa.array(np.arange(200), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rkeys, type=pa.int64()),
            "rval": pa.array(np.arange(300) * 10, type=pa.int64()),
        }
    )
    return left, right


def test_shuffle_join_inner_matches_duckdb():
    import duckdb

    from dedup_ray.stages.join import shuffle_join

    left, right = _join_sides()
    got = (
        shuffle_join(
            rd.from_arrow(left).repartition(5),
            rd.from_arrow(right).repartition(7),
            on="k",
            right_on="rk",
            num_buckets=16,
        )
        .to_pandas()
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.execute(
        "SELECT k, lval, rval FROM l JOIN r ON k = rk ORDER BY k, lval, rval"
    ).df()
    assert got[["k", "lval", "rval"]].astype("int64").equals(want.astype("int64"))


def test_shuffle_join_semi_matches_duckdb():
    import duckdb

    from dedup_ray.stages.join import shuffle_join

    left, right = _join_sides()
    got = (
        shuffle_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            on="k",
            right_on="rk",
            how="semi",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lval"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.execute(
        "SELECT k, lval FROM l WHERE k IN (SELECT rk FROM r) ORDER BY k, lval"
    ).df()
    assert got[["k", "lval"]].astype("int64").equals(want.astype("int64"))


def test_shuffle_join_empty_right_side():
    from dedup_ray.stages.join import shuffle_join

    left, right = _join_sides()
    empty_right = rd.from_arrow(right.slice(0, 0))
    out = shuffle_join(
        rd.from_arrow(left), empty_right, on="k", right_on="rk", num_buckets=4
    ).to_pandas()
    assert len(out) == 0
    semi = shuffle_join(
        rd.from_arrow(left), empty_right, on="k", right_on="rk", how="semi",
        num_buckets=4,
    ).to_pandas()
    assert len(semi) == 0


def test_shuffle_join_rejects_column_collision():
    from dedup_ray.stages.join import shuffle_join

    t = pa.table({"k": pa.array([1], type=pa.int64()), "v": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="collision"):
        shuffle_join(rd.from_arrow(t), rd.from_arrow(t), on="k")


def test_shuffle_join_anti_matches_duckdb():
    import duckdb
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    left, _ = _join_sides()
    # even keys only, so every odd left key is a guaranteed anti-join hit
    rng = np.random.default_rng(11)
    right = pa.table(
        {
            "rk": pa.array(rng.integers(0, 25, size=300) * 2, type=pa.int64()),
            "rval": pa.array(np.arange(300), type=pa.int64()),
        }
    )
    got = (
        shuffle_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            on="k",
            right_on="rk",
            how="anti",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lval"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.execute(
        "SELECT k, lval FROM l WHERE k NOT IN (SELECT rk FROM r) ORDER BY k, lval"
    ).df()
    assert got[["k", "lval"]].astype("int64").equals(want.astype("int64"))


def test_shuffle_join_anti_empty_right_keeps_all_left():
    from dedup_ray.stages.join import shuffle_join

    left, right = _join_sides()
    out = shuffle_join(
        rd.from_arrow(left), rd.from_arrow(right.slice(0, 0)),
        on="k", right_on="rk", how="anti", num_buckets=4,
    ).to_pandas()
    assert len(out) == len(left)


def test_shuffle_join_string_keys():
    """String join keys take the object-array searchsorted path; order and
    matches must still agree with a reference join."""
    import duckdb

    left = pa.table(
        {
            "k": pa.array(["apple", "pear", "apple", "kiwi", "fig"]),
            "lval": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(["apple", "fig", "fig", "mango"]),
            "rval": pa.array([10, 20, 30, 40], type=pa.int64()),
        }
    )
    from dedup_ray.stages.join import shuffle_join

    got = (
        shuffle_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.execute(
        "SELECT k, lval, rval FROM l JOIN r ON k = rk ORDER BY k, lval, rval"
    ).df()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["lval"].tolist() == want["lval"].tolist()
    assert got["rval"].tolist() == want["rval"].tolist()


def test_shuffle_join_salted_matches_unsalted():
    """salt=4 spreads hot keys over sub-buckets; output must be EXACTLY the
    unsalted join in all three modes — including a planted hot key carrying
    half of each side."""
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    rng = np.random.default_rng(3)
    lk = np.concatenate([np.full(100, 7), rng.integers(0, 30, size=100)])
    rk = np.concatenate([np.full(80, 7), rng.integers(0, 35, size=80)])
    left = pa.table({"k": pa.array(lk, type=pa.int64()),
                     "lval": pa.array(np.arange(200), type=pa.int64())})
    right = pa.table({"rk": pa.array(rk, type=pa.int64()),
                      "rval": pa.array(np.arange(160), type=pa.int64())})
    for how, cols in (("inner", ["k", "lval", "rval"]),
                      ("semi", ["k", "lval"]), ("anti", ["k", "lval"])):
        base = (
            shuffle_join(rd.from_arrow(left), rd.from_arrow(right),
                         on="k", right_on="rk", how=how, num_buckets=8)
            .to_pandas().sort_values(cols).reset_index(drop=True)
        )
        salted = (
            shuffle_join(rd.from_arrow(left).repartition(3),
                         rd.from_arrow(right).repartition(2),
                         on="k", right_on="rk", how=how, num_buckets=8, salt=4)
            .to_pandas().sort_values(cols).reset_index(drop=True)
        )
        assert salted[cols].equals(base[cols]), how


def test_shuffle_join_rejects_reserved_and_key_shadow():
    from dedup_ray.stages.join import shuffle_join

    left = pa.table({"k": pa.array([1], type=pa.int64()),
                     "lval": pa.array([1], type=pa.int64())})
    shadow = pa.table({"rk": pa.array([1], type=pa.int64()),
                       "k": pa.array([9], type=pa.int64())})
    with pytest.raises(ValueError, match="named like the left key"):
        shuffle_join(rd.from_arrow(left), rd.from_arrow(shadow), on="k", right_on="rk")
    reserved = pa.table({"rk": pa.array([1], type=pa.int64()),
                         "__side__": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="reserved"):
        shuffle_join(rd.from_arrow(left), rd.from_arrow(reserved), on="k", right_on="rk")
    with pytest.raises(ValueError, match="how must be"):
        shuffle_join(rd.from_arrow(left), rd.from_arrow(left.rename_columns(["rk", "rv"])),
                     on="k", right_on="rk", how="outer")


def test_shuffle_join_degenerate_shapes():
    """Single-row sides, all-equal keys (full cross product in one key) and
    an empty LEFT side must all join exactly."""
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    one_l = pa.table({"k": pa.array([5], type=pa.int64()),
                      "lval": pa.array([1], type=pa.int64())})
    one_r = pa.table({"rk": pa.array([5], type=pa.int64()),
                      "rval": pa.array([2], type=pa.int64())})
    got = shuffle_join(rd.from_arrow(one_l), rd.from_arrow(one_r),
                       on="k", right_on="rk").to_pandas()
    assert got.values.tolist() == [[5, 1, 2]]

    # all-equal keys: 6x4 cross product
    all_l = pa.table({"k": pa.array([9] * 6, type=pa.int64()),
                      "lval": pa.array(np.arange(6), type=pa.int64())})
    all_r = pa.table({"rk": pa.array([9] * 4, type=pa.int64()),
                      "rval": pa.array(np.arange(4), type=pa.int64())})
    cross = shuffle_join(rd.from_arrow(all_l), rd.from_arrow(all_r),
                         on="k", right_on="rk", salt=3).to_pandas()
    assert len(cross) == 24
    assert sorted(map(tuple, cross[["lval", "rval"]].values.tolist())) == sorted(
        (i, j) for i in range(6) for j in range(4)
    )

    # empty left side
    empty_l = rd.from_arrow(one_l.slice(0, 0))
    for how in ("inner", "semi", "anti"):
        out = shuffle_join(empty_l, rd.from_arrow(one_r), on="k",
                           right_on="rk", how=how).to_pandas()
        assert len(out) == 0, how


def test_shuffle_join_nested_list_column():
    """list<float> columns must survive the widen/union/searchsorted path
    (null-padding of nested types on the other side included)."""
    left = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                     "lval": pa.array([10, 20, 30], type=pa.int64())})
    right = pa.table(
        {
            "rk": pa.array([2, 3, 4], type=pa.int64()),
            "vec": pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                            type=pa.list_(pa.float32())),
        }
    )
    from dedup_ray.stages.join import shuffle_join

    got = (
        shuffle_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                     right_on="rk", num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == [2, 3]
    assert [list(v) for v in got["vec"]] == [[1.0, 2.0], [3.0, 4.0]]


def test_shuffle_join_left_matches_duckdb():
    import duckdb
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, size=150), type=pa.int64()),
            "lval": pa.array(np.arange(150), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            # right keys only >= 20: left keys 0..19 are unmatched
            "rk": pa.array(rng.integers(20, 45, size=200), type=pa.int64()),
            "rval": pa.array(np.arange(200) * 10, type=pa.int64()),
        }
    )

    def canon(df):
        df = df[["k", "lval", "rval"]].copy()
        df["rval"] = df["rval"].fillna(-1).astype("int64")
        return df.sort_values(["k", "lval", "rval"]).reset_index(drop=True)

    got = canon(
        shuffle_join(
            rd.from_arrow(left).repartition(5),
            rd.from_arrow(right).repartition(7),
            on="k", right_on="rk", how="left", num_buckets=16,
        ).to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = canon(
        con.execute("SELECT k, lval, rval FROM l LEFT JOIN r ON k = rk").df()
    )
    assert got.equals(want)
    assert (got["rval"] == -1).any()  # outer part actually exercised


def test_shuffle_join_left_empty_right_keeps_all_left_with_nulls():
    from dedup_ray.stages.join import shuffle_join

    left = pa.table(
        {"k": pa.array([1, 2, 3], type=pa.int64()),
         "lval": pa.array([10, 20, 30], type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([], type=pa.int64()),
         "rval": pa.array([], type=pa.int64())}
    )
    out = shuffle_join(
        rd.from_arrow(left), rd.from_arrow(right),
        on="k", right_on="rk", how="left", num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 3
    assert out["rval"].isna().all()
    assert out["lval"].tolist() == [10, 20, 30]


def test_shuffle_join_left_salted_matches_unsalted():
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    rng = np.random.default_rng(13)
    left = pa.table(
        {
            # one hot key (7) plus unmatched tail keys
            "k": pa.array(
                np.concatenate([np.full(60, 7), rng.integers(100, 120, 40)]),
                type=pa.int64(),
            ),
            "lval": pa.array(np.arange(100), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(
                np.concatenate([np.full(30, 7), rng.integers(0, 10, 50)]),
                type=pa.int64(),
            ),
            "rval": pa.array(np.arange(80), type=pa.int64()),
        }
    )

    def canon(ds):
        df = ds.to_pandas()
        df["rval"] = df["rval"].fillna(-1).astype("int64")
        return df.sort_values(["k", "lval", "rval"]).reset_index(drop=True)

    plain = canon(
        shuffle_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="k", right_on="rk", how="left", num_buckets=8)
    )
    salted = canon(
        shuffle_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="k", right_on="rk", how="left", num_buckets=8, salt=4)
    )
    assert plain.equals(salted)


def test_shuffle_join_full_matches_duckdb():
    import duckdb
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    rng = np.random.default_rng(17)
    left = pa.table(
        {
            # keys 0..29: 0..9 unmatched-left (right starts at 10)
            "k": pa.array(rng.integers(0, 30, size=120), type=pa.int64()),
            "lval": pa.array(np.arange(120), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            # keys 10..44: 30..44 unmatched-right
            "rk": pa.array(rng.integers(10, 45, size=160), type=pa.int64()),
            "rval": pa.array(np.arange(160) * 10, type=pa.int64()),
        }
    )

    def canon(df):
        df = df[["k", "lval", "rval"]].copy()
        df["lval"] = df["lval"].fillna(-1).astype("int64")
        df["rval"] = df["rval"].fillna(-1).astype("int64")
        return df.sort_values(["k", "lval", "rval"]).reset_index(drop=True)

    got = canon(
        shuffle_join(
            rd.from_arrow(left).repartition(5),
            rd.from_arrow(right).repartition(7),
            on="k", right_on="rk", how="full", num_buckets=16,
        ).to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = canon(
        con.execute(
            "SELECT coalesce(k, rk) AS k, lval, rval "
            "FROM l FULL OUTER JOIN r ON k = rk"
        ).df()
    )
    assert got.equals(want)
    assert (got["lval"] == -1).any()  # right-miss part exercised
    assert (got["rval"] == -1).any()  # left-miss part exercised


def test_shuffle_join_right_matches_duckdb():
    import duckdb
    import numpy as np

    from dedup_ray.stages.join import shuffle_join

    rng = np.random.default_rng(19)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, size=80), type=pa.int64()),
            "lval": pa.array(np.arange(80), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rng.integers(15, 40, size=90), type=pa.int64()),
            "rval": pa.array(np.arange(90) * 10, type=pa.int64()),
        }
    )

    def canon(df):
        df = df[["k", "lval", "rval"]].copy()
        df["lval"] = df["lval"].fillna(-1).astype("int64")
        return df.sort_values(["k", "lval", "rval"]).reset_index(drop=True)

    got = canon(
        shuffle_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(4),
            on="k", right_on="rk", how="right", num_buckets=8,
        ).to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = canon(
        con.execute(
            "SELECT coalesce(k, rk) AS k, lval, rval "
            "FROM l RIGHT JOIN r ON k = rk"
        ).df()
    )
    assert got.equals(want)
    assert (got["lval"] == -1).any()


def test_shuffle_join_full_empty_sides():
    from dedup_ray.stages.join import shuffle_join

    left = pa.table(
        {"k": pa.array([1, 2], type=pa.int64()),
         "lval": pa.array([10, 20], type=pa.int64())}
    )
    empty_r = pa.table(
        {"rk": pa.array([], type=pa.int64()),
         "rval": pa.array([], type=pa.int64())}
    )
    # empty right: full == all left rows with null rval
    out = shuffle_join(
        rd.from_arrow(left), rd.from_arrow(empty_r),
        on="k", right_on="rk", how="full", num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["lval"].tolist() == [10, 20]
    assert out["rval"].isna().all()
    # empty left: full == all right rows with null lval, key from the right
    empty_l = pa.table(
        {"k": pa.array([], type=pa.int64()),
         "lval": pa.array([], type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([5, 6], type=pa.int64()),
         "rval": pa.array([50, 60], type=pa.int64())}
    )
    out = shuffle_join(
        rd.from_arrow(empty_l), rd.from_arrow(right),
        on="k", right_on="rk", how="full", num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [5, 6]
    assert out["rval"].tolist() == [50, 60]
    assert out["lval"].isna().all()


def test_shuffle_join_full_rejects_salt():
    import pytest

    from dedup_ray.stages.join import shuffle_join

    t = pa.table(
        {"k": pa.array([1], type=pa.int64()),
         "lval": pa.array([1], type=pa.int64())}
    )
    r = pa.table(
        {"rk": pa.array([1], type=pa.int64()),
         "rval": pa.array([1], type=pa.int64())}
    )
    for how in ("full", "right"):
        with pytest.raises(ValueError, match="salt"):
            shuffle_join(
                rd.from_arrow(t), rd.from_arrow(r),
                on="k", right_on="rk", how=how, salt=4,
            )


def test_bloom_prefilter_output_identical_and_prunes():
    import numpy as np

    from dedup_ray.stages.join import bloom_prefilter, shuffle_join

    rng = np.random.default_rng(23)
    # left: mostly keys with NO right match (the pruning opportunity)
    left = pa.table(
        {
            "k": pa.array(
                np.concatenate([rng.integers(0, 20, 50),
                                rng.integers(1000, 9000, 450)]),
                type=pa.int64(),
            ),
            "lval": pa.array(np.arange(500), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rng.integers(0, 20, 60), type=pa.int64()),
            "rval": pa.array(np.arange(60), type=pa.int64()),
        }
    )
    lds, rds = rd.from_arrow(left).repartition(4), rd.from_arrow(right).repartition(2)

    def run(how, prefiltered):
        lsrc = (
            bloom_prefilter(lds, rds.select_columns(["rk"]), on="k", right_on="rk")
            if prefiltered else lds
        )
        return (
            shuffle_join(lsrc, rds, on="k", right_on="rk", how=how, num_buckets=8,
                         left_schema=left.schema, right_schema=right.schema)
            .to_pandas()
            .sort_values(["k", "lval"] + (["rval"] if how == "inner" else []))
            .reset_index(drop=True)
        )

    for how in ("inner", "semi"):
        assert run(how, True).equals(run(how, False)), how

    # the filter really prunes: unmatched tail keys never reach the shuffle
    pruned = bloom_prefilter(
        lds, rds.select_columns(["rk"]), on="k", right_on="rk"
    ).to_pandas()
    assert len(pruned) < 500
    assert (np.sort(pruned.k.unique())[:20] <= 20).all()


def test_bloom_prefilter_string_keys_no_false_negatives():
    from dedup_ray.stages.join import bloom_prefilter

    left = pa.table(
        {"k": pa.array([f"id{i}" for i in range(200)]),
         "lval": pa.array(range(200), type=pa.int64())}
    )
    right = pa.table({"rk": pa.array([f"id{i}" for i in range(0, 200, 7)])})
    out = bloom_prefilter(
        rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk"
    ).to_pandas()
    # every true match survives (Bloom has no false negatives)
    assert set(f"id{i}" for i in range(0, 200, 7)) <= set(out.k)


def test_bloom_prefilter_null_keys_dropped_not_crashed():
    from dedup_ray.stages.join import bloom_prefilter

    left = pa.table(
        {"k": pa.array([1, None, 2, None, 3], type=pa.int64()),
         "lval": pa.array([10, 20, 30, 40, 50], type=pa.int64())}
    )
    right = pa.table({"rk": pa.array([1, 3, None], type=pa.int64())})
    out = bloom_prefilter(
        rd.from_arrow(left), rd.from_arrow(right), on="k", right_on="rk"
    ).to_pandas()
    # null keys are proven non-matches for inner/semi: dropped, not crashed
    assert set(out.k) == {1, 3}

    sleft = pa.table(
        {"k": pa.array(["a", None, "b"]),
         "lval": pa.array([1, 2, 3], type=pa.int64())}
    )
    sright = pa.table({"rk": pa.array(["b", None])})
    out = bloom_prefilter(
        rd.from_arrow(sleft), rd.from_arrow(sright), on="k", right_on="rk"
    ).to_pandas()
    assert set(out.k) == {"b"}
