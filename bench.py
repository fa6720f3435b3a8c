"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:

    {"metric": "e2e_wall_sec", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "flagship_rows": R, "images_per_sec": X}

--scaling: run the flagship pipeline in FRESH processes at num_cpus=4 and 16
(N vs 4N; sandbox stand-in for two cluster sizes, BASELINE.md criterion) on
the same cached input, best-of-2 per level, and print both throughputs plus
the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

FLAGSHIP_ROWS = int(os.environ.get("DEDUP_BENCH_ROWS", "50000"))  # headline
# (the driver's per-round bench regenerates this corpus when /tmp is fresh:
# 50k keeps worst-case generation+run inside a tight time budget; scaling
# runs use SCALING_ROWS via the env override)
FLAGSHIP_IMG = (96, 160)   # realistic image sizes so decode dominates
FLAGSHIP_DUP_RATIO = 0.3   # reference benchmark middle cell (dup 0.10/0.30/0.60)
SCALING_CPUS = (4, 16)    # N vs 4N (fresh processes; sandbox cluster stand-in)
SCALING_ROWS = int(os.environ.get("DEDUP_SCALING_ROWS", "600000"))
# 1-min loadavg above which a scaling leg is flagged `contended` (ambient
# load only ever slows legs — asymmetrically, so the efficiency headline is
# untrustworthy on a busy box; 2.0 ~ a couple of stray processes on 32 cores)
SCALING_LOAD_MAX = float(os.environ.get("DEDUP_SCALING_LOAD_MAX", "2.0"))
SCALING_SETTLE_MAX = float(os.environ.get("DEDUP_SCALING_SETTLE_MAX", "180"))
                          # scaling runs use a larger input so parallel work
                          # dominates the fixed single-node orchestration
                          # floor (~8-10 s: shuffle barriers + driver merges
                          # + executor spin-ups). Round 2 cut per-row CPU
                          # ~2x (see git log), which at a FIXED input size
                          # WIDENS the floor's relative share — the honest
                          # response is to grow the measured input with the
                          # engine's speed, as a real cluster acceptance run
                          # would (fixed wall-minutes per node, not fixed
                          # rows). 400k rows ~ 17 GB held that line mid-round;
                          # after the session-10 code got another ~16% faster
                          # (6.79 s / 50k idle-box), 600k keeps the floor
                          # under ~20% of the 16-CPU wall.


def _sf_tag(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(scope: str) -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dedup_ray.pipelines.neardup import run_neardup
    from dedup_ray.sources.corpus import generate_corpus

    corpus_dir = f"/tmp/dedup_ray_bench_{FLAGSHIP_ROWS}_r{FLAGSHIP_DUP_RATIO}"
    generate_corpus(
        corpus_dir, scale="bench", n_rows=FLAGSHIP_ROWS, use_ray=True,
        img_min=FLAGSHIP_IMG[0], img_max=FLAGSHIP_IMG[1],
        dup_ratio=FLAGSHIP_DUP_RATIO,
    )
    corpus = os.path.join(corpus_dir, "images.parquet")

    # warm the page cache so both scaling runs measure compute, not first-read
    paths = (
        [os.path.join(corpus, p) for p in os.listdir(corpus)]
        if os.path.isdir(corpus)
        else [corpus]
    )
    for path in paths:
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass

    queries: dict[str, float] = {}

    # discarded warmup run: Python imports on every worker process dominate a
    # cold first run (the reference harness discards a warmup for the same
    # reason, /root/reference/benchmark/runner.py:105-109)
    warm = run_neardup(corpus, concurrency=max(2, ncpu // 2))
    del warm
    import gc

    gc.collect()  # release the warmup's pinned blocks before timing
    time.sleep(3)

    t0 = time.time()
    res = run_neardup(corpus, concurrency=max(2, ncpu // 2))
    n_clusters = res.clusters.count()
    queries["flagship_neardup"] = round(time.time() - t0, 2)
    flagship_sec = queries["flagship_neardup"]

    if scope == "full":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as e

        qs = e.queries()
        for name in (
            "q1_pricing_summary", "filter_count", "top_orders",
            "revenue_by_segment", "events_hourly", "events_rollup", "sessionize",
            "asof_join_clicks", "sliding_window_counts", "event_gaps",
            "range_join_price_bands", "order_revenue_join",
            "bulk_order_priorities",
            "token_stats", "quality_summary", "top_docs_per_lang",
            "numeric_profile", "top_terms", "lang_length_quantiles",
            "exact_dedup_groups",
            "minhash_neardup_docs", "simhash_near_pairs",
            "ann_topk", "cosine_neardup_pairs", "embedding_lsh_buckets",
            "embedding_neardup_lsh", "lang_embedding_norms",
            "hash_split_docs", "sample_per_source", "dup_ngrams",
            "rarest_term_per_doc", "length_quartiles", "customer_order_counts",
            "order_lineitem_full", "user_value_running",
            "trim_length_outliers", "mix_sources", "length_cume_dist",
            "ann_pq_topk", "remove_dup_passages", "lang_source_matrix",
            "caption_quality", "curate_docs",
            "events_debounced", "caption_dup_images",
            "rotation_invariant_clusters", "bpe_token_counts",
            "above_avg_orders", "image_histogram_search",
            "nation_revenue", "event_transitions", "approx_value_quantiles",
            "lm_perplexity_scores",
            "lang_shared_terms", "lang_exclusive_shingles", "heavy_hitter_users",
            "orders_global_rank", "top_event_type_per_user",
            "user_event_sequence", "user_value_moving_max",
            "exact_value_median", "diff_snapshots",
            "events_window_dedup", "decontaminate_images",
            "latest_event_per_user", "funnel_conversions",
            "source_dedup_stats", "shipping_priority", "events_pivot",
            "user_value_ntile", "value_stats_by_type", "term_postings",
            "minhash_dedup_keep", "revenue_running_by_date",
            "edit_distance_pairs", "minhash_keep_longest",
            "customer_order_dense_rank", "revenue_share_by_segment",
            "events_cube", "normalized_dedup_groups", "co_event_pairs",
            "interleave_sources", "stratified_split_docs", "price_qty_corr",
            "term_cooccurrence", "events_hourly_dense", "orders_profile",
            "chunk_docs", "above_avg_sources", "hourly_anomalies",
            "source_lang_purity", "revenue_rolling_7d", "pii_stats",
            "oov_rate", "repeat_orders_7d", "proportional_sample",
            "neardup_cluster_sizes", "compression_ratio", "char_entropy",
            "orders_denormalized", "remove_rare_tokens", "user_lifetimes",
            "duplicate_event_keys", "self_repetition",
            "extreme_norm_vectors", "weekly_revenue_growth",
            "lang_length_cume_dist", "retention_cohorts", "value_mad",
            "median_price_by_priority", "pareto_parts", "price_histogram",
            "image_size_filter", "cumulative_users_by_day",
            "weighted_discount_by_flag", "customer_revenue_gini",
            "props_k_stats", "containment_pairs", "upsert_docs",
            "custdist", "priority_return_counts", "promo_revenue_pct",
            "small_qty_part_revenue", "large_volume_orders",
            "rich_no_urgent_customers", "users_all_types",
            "pareto_customers_80pct", "event_value_outliers",
            "caption_keep_best_image", "aspect_bucket_batches",
            "decontaminate_docs_fuzzy", "key_skew_stats",
            "embedding_dim_minmax", "docs_checksum",
            "top_return_customers", "kmeans_global_train",
            "order_revenue_join_salted", "price_qty_histogram2d",
            "rate_limit_events", "top_supplier_revenue",
            "quadrant_crop_pairs", "embedding_pca",
            "phash_distance_histogram", "langid_confusion",
            "bm25_search", "nation_trade_volume", "trade_graph_pagerank",
            "weighted_sample_docs", "image_channel_stats",
            "forecast_revenue", "brand_qty_revenue", "market_share",
            "product_profit", "sole_blame_suppliers",
            "min_cost_supplier", "important_parts", "part_supplier_counts",
            "excess_share_suppliers", "supplier_nations",
            "distinct_users_by_type", "approx_distinct_users",
            "boilerplate_ngrams", "knn_graph", "ann_ivf_topk",
            "semdedup_embeddings", "df_histogram", "dup_bigram_fraction",
            "normalize_text", "cap_per_source", "pack_sequences",
            "decontaminate_docs", "late_ship_priorities",
            "value_percentile", "zone_map_stats",
            "value_percentile_by_type", "referential_integrity",
            "vocab_coverage", "user_day_streaks",
            "price_slope_by_priority", "copurchase_triangles",
            "copurchase_clustering", "overlapping_order_spans",
            "rolling_7d_dau", "source_overlap_matrix",
            "association_rules", "lang_source_chi2_cells",
            "minhash_funnel_stats", "phash_bitplane_stats",
            "bulk_order_priorities_bloom",
            "prefix_dup_groups", "simhash_dedup_keep", "leakage_safe_split",
            "letterbox_dedup_clusters", "minhash_threshold_sweep",
            "temperature_mix_weights", "doc_neardup_clusters",
            "doc_neardup_report", "doc_neardup_keep",
            "letterbox_stats",
        ):
            t0 = time.time()
            out = qs[name](sf_dir)
            # consume: Datasets are lazy
            import ray.data as rd

            if isinstance(out, rd.Dataset):
                out.count()
            queries[name] = round(time.time() - t0, 2)

    result = {
        "metric": "e2e_wall_sec",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_tag(sf_dir),
        "num_cpus": ncpu,
        "flagship_rows": FLAGSHIP_ROWS,
        "flagship_clusters": int(n_clusters),
        "images_per_sec": round(FLAGSHIP_ROWS / flagship_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same flagship job at N and 4N CPUs in fresh processes; efficiency =
    (t_lo/t_hi)/(hi/lo), 1.0 = linear (BASELINE.md criterion >= 0.8)."""
    # pre-generate the corpus once so neither timed process pays for it
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from dedup_ray.sources.corpus import generate_corpus

    generate_corpus(
        f"/tmp/dedup_ray_bench_{SCALING_ROWS}_r{FLAGSHIP_DUP_RATIO}", scale="bench",
        n_rows=SCALING_ROWS, use_ray=True,
        img_min=FLAGSHIP_IMG[0], img_max=FLAGSHIP_IMG[1],
        dup_ratio=FLAGSHIP_DUP_RATIO,
    )
    ray.shutdown()
    # INTERLEAVED best-of-2 per level (hi, lo, hi, lo): ambient load on this
    # shared box drifts on minute scales; interleaving spreads the drift
    # across both levels instead of biasing whichever level ran last, and
    # min-per-level rejects the noise (which only ever ADDS time).
    out = {}
    legs = []  # per-leg loadavg bookkeeping (round-2 review #6: the
    # official number must be machine-checkable as uncontended, not
    # narrated) — a leg that STARTS on a loaded box is flagged, and the
    # headline carries `contended` so a dirty measurement can't silently
    # become the official row.
    lo_, hi_ = SCALING_CPUS
    for ncpu in (hi_, lo_, hi_, lo_):
        # settle-wait: the PREVIOUS leg's load lingers in the 1-min loadavg
        # for ~a minute after its process exits; without this wait every
        # leg after the first reads as "contended" from our own decay.
        # Bounded (default 180 s) so a genuinely busy box still proceeds —
        # flagged — rather than hanging.
        settle_deadline = time.time() + SCALING_SETTLE_MAX
        while os.getloadavg()[0] > SCALING_LOAD_MAX and time.time() < settle_deadline:
            time.sleep(10)
        load_before = os.getloadavg()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SCOPE="flagship",
                   DEDUP_BENCH_ROWS=str(SCALING_ROWS))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        got = json.loads(r.stdout.strip().splitlines()[-1])
        leg_contended = load_before[0] > SCALING_LOAD_MAX
        legs.append(
            {"cpus": ncpu, "sec": got["queries"]["flagship_neardup"],
             "loadavg_before": [round(x, 2) for x in load_before],
             "loadavg_after": [round(x, 2) for x in os.getloadavg()],
             "contended": leg_contended}
        )
        prev = out.get(ncpu)
        if prev is None or (
            got["queries"]["flagship_neardup"] < prev["queries"]["flagship_neardup"]
        ):
            out[ncpu] = got
            out[ncpu]["_contended"] = leg_contended
        time.sleep(10)  # let the torn-down Ray session settle
    lo, hi = SCALING_CPUS
    t_lo = out[lo]["queries"]["flagship_neardup"]
    t_hi = out[hi]["queries"]["flagship_neardup"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"images_per_sec_{lo}": out[lo]["images_per_sec"],
        f"images_per_sec_{hi}": out[hi]["images_per_sec"],
        "flagship_rows": SCALING_ROWS,
        "cpus": list(SCALING_CPUS),
        # headline validity: True when EITHER selected best-of leg started
        # on a box above the load gate — rerun on a quiet box in that case
        "contended": bool(out[lo]["_contended"] or out[hi]["_contended"]),
        "load_gate_1min": SCALING_LOAD_MAX,
        "legs": legs,
    }


MATRIX_PROFILES = {  # image-dimension analogs of the reference's file-size
    "small-heavy": (48, 96),  # profiles (benchmark/config.py:8-19)
    "mixed": (64, 160),
    "large-heavy": (96, 256),
}
MATRIX_DUP_RATIOS = (0.10, 0.30, 0.60)
MATRIX_ROWS = 5000


def run_matrix() -> dict:
    """Reference-style 3 size profiles x 3 dup ratios sweep
    (/root/reference/benchmark/runner.py:221-271) with the harness's
    accuracy cross-check upgraded to pair-level recall/precision vs the
    single-process oracle (runner.py:181-210 analog). Small per-cell corpora;
    results recorded in BASELINE.md."""
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    from dedup_ray.oracle.recall import pair_recall_precision
    from dedup_ray.oracle.refimpl import oracle_clusters
    from dedup_ray.pipelines.neardup import run_neardup
    from dedup_ray.sources.corpus import generate_corpus

    cells = []
    for prof, (lo, hi) in MATRIX_PROFILES.items():
        for ratio in MATRIX_DUP_RATIOS:
            cdir = f"/tmp/dedup_matrix_{prof}_{ratio}"
            generate_corpus(cdir, scale="bench", n_rows=MATRIX_ROWS, use_ray=True,
                            img_min=lo, img_max=hi, dup_ratio=ratio)
            corpus = os.path.join(cdir, "images.parquet")
            t0 = time.time()
            res = run_neardup(corpus)
            cl = res.clusters.to_pandas()
            sec = round(time.time() - t0, 2)
            tbl = pq.read_table(corpus)
            m = pair_recall_precision(
                dict(zip(cl["image_id"], cl["cluster_id"])), oracle_clusters(tbl)
            )
            cells.append({
                "profile": prof, "dup_ratio": ratio, "rows": MATRIX_ROWS,
                "sec": sec, "images_per_sec": round(MATRIX_ROWS / sec, 1),
                "clusters": res.stats["duplicate_clusters"],
                "recall": round(m["recall"], 4), "precision": round(m["precision"], 4),
            })
            print(json.dumps(cells[-1]), file=sys.stderr)
    ray.shutdown()
    return {"metric": "matrix", "cells": cells,
            "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32"))}


def render_matrix(matrix: dict) -> str:
    """Text rendering of a --matrix result: a markdown table plus an ASCII
    throughput bar chart per (profile, dup_ratio) cell — the sandbox analog
    of the reference's plotted benchmark matrix
    (/root/reference/benchmark/plotting.py renders the same sweep as
    images; no plotting libs are available here, so bars are rendered as
    text and saved alongside the JSON)."""
    cells = matrix.get("cells", [])
    if not cells:
        return "(empty matrix)"
    lines = [
        f"# Benchmark matrix ({matrix.get('num_cpus', '?')} CPUs)",
        "",
        "| profile | dup_ratio | rows | sec | img/s | clusters | recall | precision |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for c in cells:
        lines.append(
            "| {profile} | {dup_ratio} | {rows} | {sec} | {images_per_sec} "
            "| {clusters} | {recall} | {precision} |".format(**c)
        )
    lines += ["", "## Throughput (img/s)", ""]
    peak = max(c["images_per_sec"] for c in cells) or 1.0
    for c in cells:
        bar = "#" * max(1, int(40 * c["images_per_sec"] / peak))
        label = f"{c['profile']}/r{c['dup_ratio']}"
        lines.append(f"{label:<22} {bar} {c['images_per_sec']:.0f}")
    lines += ["", "## Accuracy", ""]
    for c in cells:
        flag = "" if c["recall"] >= 0.99 and c["precision"] >= 0.99 else "  <-- CHECK"
        lines.append(
            f"{c['profile']}/r{c['dup_ratio']:<6} recall={c['recall']:.4f} "
            f"precision={c['precision']:.4f}{flag}"
        )
    return "\n".join(lines) + "\n"


# incremental-bench cells: (tag, rows, (img_min, img_max)). The flagship
# cell shares the headline corpus; the decode-heavy cell uses larger images,
# where decode dominates and the incremental decode-∝-|delta| story shows.
INCR_CELLS = [
    ("flagship", FLAGSHIP_ROWS, FLAGSHIP_IMG),
    ("decode-heavy", 20_000, (160, 256)),
    ("decode-bound", 10_000, (320, 512)),
]


def _incr_paths(rows: int, img: tuple[int, int]) -> dict:
    cdir = f"/tmp/dedup_ray_bench_incr_{rows}_{img[0]}x{img[1]}"
    return {
        "cdir": cdir,
        "corpus": os.path.join(cdir, "corpus", "images.parquet"),
        "prior": os.path.join(cdir, "prior.parquet"),
        "delta": os.path.join(cdir, "delta.parquet"),
        "ck": os.path.join(cdir, "prior_ck"),
    }


def _incremental_phase(phase: str) -> dict:
    """One phase of the incremental bench, run in its OWN process: same-
    session reruns inherit object-store pressure from the previous phase and
    measure 2-3x slow (the reason run_scaling uses fresh processes too)."""
    rows = int(os.environ["DEDUP_INCR_ROWS"])
    img = tuple(int(x) for x in os.environ["DEDUP_INCR_IMG"].split(","))
    p = _incr_paths(rows, img)

    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dedup_ray.pipelines.neardup import run_neardup

    out: dict = {"phase": phase}
    if phase == "setup":
        import shutil

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dedup_ray.sources.corpus import generate_corpus

        # drop derived artifacts but KEEP the corpus dir — generate_corpus
        # caches a finished corpus and regenerating GBs dominates setup time
        for name in ("prior.parquet", "delta.parquet"):
            try:
                os.remove(os.path.join(p["cdir"], name))
            except OSError:
                pass
        shutil.rmtree(p["ck"], ignore_errors=True)
        generate_corpus(os.path.dirname(p["corpus"]), scale="bench", n_rows=rows,
                        use_ray=True, img_min=img[0], img_max=img[1],
                        dup_ratio=FLAGSHIP_DUP_RATIO)
        t = pq.read_table(p["corpus"])
        delta_mask = np.arange(t.num_rows) % 5 == 0
        # small row groups: Ray parallelizes parquet reads per row group, and
        # the delta file is 1/5 the corpus — coarse groups serialize its decode
        pq.write_table(t.filter(pa.array(~delta_mask)), p["prior"],
                       row_group_size=512)
        pq.write_table(t.filter(pa.array(delta_mask)), p["delta"],
                       row_group_size=512)
        out["delta_rows"] = int(delta_mask.sum())
        del t
        run_neardup(p["prior"], checkpoint_dir=p["ck"])  # standing corpus
    elif phase == "inc":
        from dedup_ray.pipelines.incremental import run_neardup_incremental

        t0 = time.time()
        res = run_neardup_incremental(p["prior"], p["ck"], p["delta"])
        out["sec"] = round(time.time() - t0, 2)
        out["stats"] = res.stats
    elif phase == "full":
        t0 = time.time()
        res = run_neardup(p["corpus"])
        out["sec"] = round(time.time() - t0, 2)
        out["stats"] = res.stats
    ray.shutdown()
    return out


def run_incremental() -> dict:
    """Incremental admission vs full re-run, per INCR_CELLS cell: corpus
    split 80/20, prior side clustered+checkpointed (setup, untimed), then
    (a) the 20% delta admitted via run_neardup_incremental and (b) a full
    run over the union, each timed in a FRESH process. The speedup is the
    scale story: incremental decode work ∝ |delta|, full-run ∝ |corpus|."""

    def spawn(phase: str, rows: int, img: tuple[int, int]) -> dict:
        env = dict(os.environ, DEDUP_INCR_ROWS=str(rows),
                   DEDUP_INCR_IMG=f"{img[0]},{img[1]}")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--incremental-phase", phase],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(r.stdout.strip().splitlines()[-1])

    cells = []
    for tag, rows, img in INCR_CELLS:
        setup = spawn("setup", rows, img)
        inc = spawn("inc", rows, img)
        full = spawn("full", rows, img)
        assert inc["stats"] == full["stats"], (inc["stats"], full["stats"])
        cells.append({
            "cell": tag, "rows": rows, "img": list(img),
            "incremental_sec": inc["sec"], "full_sec": full["sec"],
            "speedup": round(full["sec"] / inc["sec"], 2),
            "delta_rows": setup["delta_rows"],
            "delta_rows_per_sec": round(setup["delta_rows"] / inc["sec"], 1),
            "stats_equal": True,
        })
        print(json.dumps(cells[-1]), file=sys.stderr)
    return {
        "metric": "incremental_speedup",
        "value": cells[0]["speedup"],
        "unit": "ratio",
        "cells": cells,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--matrix" in sys.argv:
        m = run_matrix()
        print(json.dumps(m))
        # render the text chart next to the JSON (reference plotting analog)
        with open("/tmp/dedup_matrix.md", "w") as f:
            f.write(render_matrix(m))
        print("matrix chart written to /tmp/dedup_matrix.md", file=sys.stderr)
    elif "--plot" in sys.argv:
        # --plot <matrix.json> [out.md]: render a saved matrix result
        i = sys.argv.index("--plot")
        src = sys.argv[i + 1]
        dst = sys.argv[i + 2] if len(sys.argv) > i + 2 else "/tmp/dedup_matrix.md"
        with open(src) as f:
            txt = render_matrix(json.load(f))
        with open(dst, "w") as f:
            f.write(txt)
        print(txt)
    elif "--incremental-phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--incremental-phase") + 1]
        print(json.dumps(_incremental_phase(phase)))
    elif "--incremental" in sys.argv:
        print(json.dumps(run_incremental()))
    else:
        scope = os.environ.get("BENCH_SCOPE", "full")
        print(json.dumps(run_bench(scope)))
