"""Multi-shard object-store spill stress (SCALE.md round-3 evidence item).

Runs the image flagship ONCE over a 2M-row multi-file corpus (~26 GB of
parquet — larger than the 30% object-store share of this box's 128 GiB, so
the streaming executor must spill) and records wall time, per-stage
counters, cluster count, and Ray's own spill statistics. Usage:

    python tools/spill_stress.py [n_rows] [img_min] [img_max]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    img = (
        int(sys.argv[2]) if len(sys.argv) > 2 else 48,
        int(sys.argv[3]) if len(sys.argv) > 3 else 96,
    )

    import ray

    # optional object-store cap (bytes) to force spill at sandbox scale —
    # production 100-TB runs spill naturally; on a 128 GiB box a pipeline
    # that drops image bytes at decode holds too little to overflow the
    # default 30% store, so the stress caps it explicitly
    store = os.environ.get("DEDUP_OBJECT_STORE_BYTES")
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
        **({"object_store_memory": int(store)} if store else {}),
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dedup_ray.pipelines.neardup import run_neardup
    from dedup_ray.sources.corpus import generate_corpus

    cdir = f"/tmp/dedup_spill_{n_rows}_{img[0]}x{img[1]}"
    t0 = time.time()
    generate_corpus(
        cdir, scale="bench", n_rows=n_rows, use_ray=True,
        img_min=img[0], img_max=img[1], dup_ratio=0.3,
    )
    gen_sec = round(time.time() - t0, 1)
    corpus = os.path.join(cdir, "images.parquet")
    n_files = len(os.listdir(corpus)) if os.path.isdir(corpus) else 1
    size_gb = round(
        sum(
            os.path.getsize(os.path.join(corpus, p))
            for p in (os.listdir(corpus) if os.path.isdir(corpus) else [])
        )
        / 2**30,
        2,
    )

    # optional detector-config overrides (the SCALE.md keyspace experiments):
    # DEDUP_PHASH_BANDS / DEDUP_PHASH_COMBO widen the phash combo keys,
    # DEDUP_PAIR_DEDUP forces the pair-dedup mode
    from dedup_ray.config import DedupConfig

    cfg_kwargs = {}
    if os.environ.get("DEDUP_PHASH_BANDS"):
        cfg_kwargs["phash_bands"] = int(os.environ["DEDUP_PHASH_BANDS"])
    if os.environ.get("DEDUP_PHASH_COMBO"):
        cfg_kwargs["phash_combo_size"] = int(os.environ["DEDUP_PHASH_COMBO"])
    if os.environ.get("DEDUP_PAIR_DEDUP"):
        cfg_kwargs["pair_dedup"] = os.environ["DEDUP_PAIR_DEDUP"]
    if os.environ.get("DEDUP_MH_PREFILTER"):
        cfg_kwargs["minhash_prefilter_nibbles"] = int(
            os.environ["DEDUP_MH_PREFILTER"]
        )
    if os.environ.get("DEDUP_PHASH_CASCADE"):
        # "0" disables the round-5 saturation cascade (star/chain fallback),
        # "1" forces it on; DEDUP_CASCADE_BANDS/COMBO tune the fine keys
        cfg_kwargs["phash_cascade"] = bool(int(os.environ["DEDUP_PHASH_CASCADE"]))
    if os.environ.get("DEDUP_CASCADE_BANDS"):
        cfg_kwargs["phash_cascade_bands"] = int(os.environ["DEDUP_CASCADE_BANDS"])
    if os.environ.get("DEDUP_CASCADE_COMBO"):
        cfg_kwargs["phash_cascade_combo"] = int(os.environ["DEDUP_CASCADE_COMBO"])
    cfg = DedupConfig(**cfg_kwargs) if cfg_kwargs else None

    load0 = os.getloadavg()
    t0 = time.time()
    res = run_neardup(corpus, cfg=cfg, concurrency=16, progress=True)
    n_clusters = res.clusters.count()
    wall = round(time.time() - t0, 1)

    # spill statistics: memory_summary needs grpc (absent here), so read the
    # raylet's debug state dump directly
    spilled: list[str] = []
    try:
        from ray._private.internal_api import memory_summary

        mem = memory_summary(stats_only=True)
        spilled = [ln.strip() for ln in mem.splitlines() if "pill" in ln.lower()]
    except Exception:
        # raylet.out's periodic state dump carries the Spill/Restore RPC
        # counters (debug_state.txt is not written in this Ray build)
        session = ray._private.worker._global_node.get_session_dir_path()
        raylet = os.path.join(session, "logs", "raylet.out")
        if os.path.exists(raylet):
            with open(raylet) as f:
                hits = [
                    ln.strip()
                    for ln in f
                    if ("SpillObjects -" in ln or "RestoreSpilledObjects -" in ln)
                ]
            spilled = hits[-2:]  # last state dump = end-of-run totals
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "img": list(img),
                "input_files": n_files,
                "input_gb": size_gb,
                "gen_sec": gen_sec,
                "cfg_overrides": cfg_kwargs,
                "flagship_sec": wall,
                "images_per_sec": round(n_rows / wall, 1),
                "clusters": int(n_clusters),
                "dup_rows": res.stats.get("duplicate_rows"),
                "counters": res.counters,
                "spill_lines": spilled,
                "loadavg_before": [round(x, 2) for x in load0],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
