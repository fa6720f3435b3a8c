"""queries()/oracle_sql() parity at sf0.001 (the same comparison the driver
runs at sf0.01 — DuckDB as differential oracle, SURVEY.md §5)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# fast representatives of each operator family (full set covered by
# tools/check_oracle.py at sf0.01)
CHECKED = [
    "exact_dedup_groups",
    "size_groups",
    "token_stats",
    "token_count_regex",
    "ngram_jaccard_pairs",
    "q1_pricing_summary",
    "top_orders",
    "revenue_by_segment",
    "events_hourly",
    "sessionize",
    "ann_topk",
    "order_revenue_join",
    "bulk_order_priorities",
    "top_docs_per_lang",
    "numeric_profile",
    "top_terms",
    "lang_embedding_norms",
    "lang_length_quantiles",
    "event_gaps",
    "events_rollup",
    "hash_split_docs",
    "sample_per_source",
    "dup_ngrams",
    "rarest_term_per_doc",
    "bm25_search",
    "nation_trade_volume",
    "weighted_sample_docs",
    "length_quartiles",
    "customer_order_counts",
    "phash_hamming_search",
    "doc_jaccard_search",
    "df_histogram",
    "order_lineitem_full",
    "user_value_running",
    "trim_length_outliers",
    "mix_sources",
    "length_cume_dist",
    "remove_dup_passages",
    "lang_source_matrix",
    "lang_shared_terms",
    "corpus_format_stats",
    "lang_exclusive_shingles",
    "heavy_hitter_users",
    "caption_quality",
    "curate_docs",
    "orders_global_rank",
    "top_event_type_per_user",
    "user_event_sequence",
    "user_value_moving_max",
    "exact_value_median",
    "diff_snapshots",
    "events_window_dedup",
    "decontaminate_images",
    "latest_event_per_user",
    "funnel_conversions",
    "source_dedup_stats",
    "shipping_priority",
    "events_pivot",
    "user_value_ntile",
    "value_stats_by_type",
    "term_postings",
    "revenue_running_by_date",
    "customer_order_dense_rank",
    "revenue_share_by_segment",
    "events_cube",
    "co_event_pairs",
    "interleave_sources",
    "stratified_split_docs",
    "price_qty_corr",
    "term_cooccurrence",
    "events_hourly_dense",
    "orders_profile",
    "chunk_docs",
    "above_avg_sources",
    "hourly_anomalies",
    "source_lang_purity",
    "revenue_rolling_7d",
    "pii_stats",
    "oov_rate",
    "repeat_orders_7d",
    "proportional_sample",
    "orders_denormalized",
    "remove_rare_tokens",
    "user_lifetimes",
    "extreme_norm_vectors",
    "weekly_revenue_growth",
    "lang_length_cume_dist",
    "retention_cohorts",
    "value_mad",
    "median_price_by_priority",
    "pareto_parts",
    "price_histogram",
    "image_size_filter",
    "cumulative_users_by_day",
    "weighted_discount_by_flag",
    "customer_revenue_gini",
    "props_k_stats",
    "containment_pairs",
    "upsert_docs",
    "custdist",
    "priority_return_counts",
    "promo_revenue_pct",
    "small_qty_part_revenue",
    "large_volume_orders",
    "rich_no_urgent_customers",
    "users_all_types",
    "pareto_customers_80pct",
    "event_value_outliers",
    "caption_keep_best_image",
    "aspect_bucket_batches",
    "key_skew_stats",
    "embedding_dim_minmax",
    "docs_checksum",
    "top_return_customers",
    "order_revenue_join_salted",
    "price_qty_histogram2d",
    "rate_limit_events",
    "top_supplier_revenue",
    # the minhash-candidate family (minhash_dedup_keep, minhash_keep_longest,
    # edit_distance_pairs) is deliberately NOT here: 70-180 s each at the
    # 4-CPU pytest session; tools/check_oracle.py covers them at sf0.01
]


@pytest.fixture(scope="module")
def entrymod():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(obj):
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(entrymod, con, name):
    got = _canon(_to_pandas(entrymod.queries()[name](SF)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_all_queries_have_callable(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key maps to a query
    assert set(entrymod.oracle_sql()) <= set(qs)


def test_multimodal_features(tiny_corpus):
    import os

    from dedup_ray.stages.multimodal import (
        AudioFeatures,
        ImageResizer,
        VideoFrameSampler,
        image_features,
    )

    images = rd.read_parquet(os.path.join(tiny_corpus, "images.parquet"))
    feats = image_features(images).to_pandas()
    assert feats.decode_ok.all()
    assert ((feats.mean_r >= 0) & (feats.mean_r <= 255)).all()

    rs = ImageResizer(max_side=8)
    batch = pa.Table.from_pandas(
        rd.read_parquet(os.path.join(tiny_corpus, "images.parquet")).take_batch(
            5, batch_format="pandas"
        )
    )
    out = rs(batch)
    assert (pd.Series(out["w"].to_pylist()) <= 8).all()

    # unreadable audio/video payloads are dropped + counted, never raised
    bad_clip = pa.table(
        {"clip_id": pa.array(["a"]), "bytes": pa.array([b"junk"], type=pa.binary())}
    )
    assert AudioFeatures()(bad_clip).num_rows == 0
    bad_video = pa.table(
        {"video_id": pa.array(["a"]), "bytes": pa.array([b"junk"], type=pa.binary())}
    )
    assert VideoFrameSampler()(bad_video).num_rows == 0


def test_numeric_profile_empty_table(tmp_path, ray_session):
    """An empty documents table must still emit the one SQL-parity aggregate
    row (n_rows=0, NULL stats), not an empty dataset."""
    import os

    import duckdb

    import __ray_entry__ as e
    from dedup_ray.pipelines.analysis import numeric_profile

    pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "documents.parquet"))
    got = numeric_profile(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(e.oracle_sql()["numeric_profile"]).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_normalized_dedup_groups_planted(tmp_path, ray_session):
    """Planted case/whitespace variants: normalized dedup must group them
    (and match its own oracle), while exact dedup must NOT."""
    import os

    import duckdb

    import __ray_entry__ as e
    from dedup_ray.pipelines.text import exact_dedup_groups, normalized_dedup_groups

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4, 5, 6], dtype="int64"),
            "text": [
                "Hello   World",
                "hello world",
                "  HELLO\tWORLD ",
                "something else",
                "Another doc",
                "another\n doc",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": pd.Series([13, 11, 15, 14, 11, 12], dtype="int64"),
        }
    )
    docs.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = normalized_dedup_groups(str(tmp_path)).to_pandas()
    got = got.sort_values("rep_id").reset_index(drop=True)
    assert got.to_dict("records") == [
        {"rep_id": 1, "n_dups": 3},
        {"rep_id": 5, "n_dups": 2},
    ]
    assert exact_dedup_groups(str(tmp_path)).num_rows == 0

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(e.oracle_sql()["normalized_dedup_groups"]).df()
    want = want.sort_values("rep_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pii_stats_and_oov_planted(tmp_path, ray_session):
    """Planted PII + OOV tokens: nonzero paths for both census operators,
    matched against their own oracles on the planted corpus."""
    import os

    import duckdb

    import __ray_entry__ as e
    from dedup_ray.pipelines.analysis import oov_rate
    from dedup_ray.pipelines.curation import pii_stats

    texts = [
        "contact me at alice@example.com or +1 (555) 123-4567 now",
        "plain common words common words",
        "xylophone quixotic zephyr",  # pure OOV vs a tiny top vocab
        "bob@corp.io wrote common words",
        "",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series(range(1, 6), dtype="int64"),
            "text": texts,
            "lang": ["en"] * 5,
            "source": ["a", "a", "b", "b", "b"],
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = pii_stats(str(tmp_path)).to_pandas().sort_values("source")
    assert int(got["docs_with_pii"].sum()) == 2  # docs 1 (email+phone) and 4
    assert int(got["n_emails"].sum()) == 2
    assert int(got["n_phones"].sum()) >= 1

    rates = oov_rate(str(tmp_path), k=3).to_pandas().set_index("doc_id")
    assert rates.loc[5, "n_tokens"] == 0 and rates.loc[5, "rate"] == 0.0
    assert rates.loc[3, "rate"] == 1.0  # all three tokens out-of-vocab

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    for name, ray_df in (
        ("pii_stats", got),
        ("oov_rate", oov_rate(str(tmp_path), k=50).to_pandas()),
    ):
        want = con.sql(e.oracle_sql()[name]).df()
        a = ray_df[sorted(ray_df.columns)].sort_values(
            list(sorted(ray_df.columns))).reset_index(drop=True)
        b = want[sorted(want.columns)].sort_values(
            list(sorted(want.columns))).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_duplicate_event_keys_planted(tmp_path, ray_session):
    """Planted duplicate (user_id, ts) keys must surface with counts."""
    import os

    from dedup_ray.pipelines.relational import duplicate_event_keys

    ts = pd.to_datetime(
        ["2026-01-01 10:00", "2026-01-01 10:00", "2026-01-01 10:00",
         "2026-01-01 11:00", "2026-01-02 09:00"]
    ).astype("datetime64[us]")
    pd.DataFrame(
        {
            "event_id": pd.Series(range(5), dtype="int64"),
            "user_id": pd.Series([7, 7, 7, 7, 8], dtype="int64"),
            "event_type": ["a"] * 5,
            "ts": ts,
            "value": pd.Series([1.0] * 5, dtype="float64"),
        }
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = duplicate_event_keys(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == [
        {"user_id": 7, "ts": pd.Timestamp("2026-01-01 10:00"), "n": 3}
    ]
