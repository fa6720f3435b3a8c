"""Incremental near-dup: dedup a DELTA batch against a prior run's persisted
state — the daily-ingestion operation of a training-data pipeline. At 100 TB
you never re-decode the standing corpus to admit a day's new images; you
replay its (cheap, digest-only) keys and edges and pay decode + signatures +
verify ONLY for the delta.

No reference analog (the reference rescans from zero each run,
/root/reference/src/main.rs:155-205); the correctness contract is defined
against this repo's own full run instead:

    clusters(incremental(prior, delta)) == clusters(full(prior ∪ delta))

given the same config (property-tested in tests/test_incremental.py; exact
when no LSH bucket exceeds ``bucket_pair_cap`` — capping picks pairs by
bucket population, which differs between the two runs, the same documented
trade as stages/lsh.py).

Why the equality holds (each stage's incremental form is exact):

* keys — prior rows replay their checkpointed digests. The only rows whose
  keys depend on OTHER rows are cascade sentinels (phash-unique rows skip
  pixel decode); a delta row colliding with a prior-unique phash invalidates
  that sentinel, so exactly those prior rows (sentinel ∧ phash ∈ delta) are
  re-decoded, and delta rows decode against the UNION dup-phash set. The
  resulting union keys table is row-identical to a full run's.
* exact tier — recomputed over the union keys (digest-only shuffle: ids,
  hashes, captions — never bytes; the expensive decode is what we skipped).
* signatures — recomputed per union rep. Measured trade (round-2 profile,
  50k rows / 32 CPUs): signing ALL union reps is 1.1 s of a 25 s run (~4%)
  vs 8.7 s for the delta decode — per-rep MinHash is ~25 µs while decode is
  ~3 ms/row, so recompute stays a rounding error at any scale with this
  ratio. Replaying prior signatures would also need a per-class staleness
  join (a delta member can dethrone a prior rep); not worth the machinery.
* candidates/verify — only pairs touching a delta id are verified: a
  prior-prior candidate pair has identical (sig, phash, caption) inputs in
  both runs, so it was a candidate in the prior run and its verified edge is
  replayed from the prior checkpoint. Rep-identity drift (a delta id
  becoming the min of an existing class) is absorbed by the exact-tier star
  edges connecting old and new rep.
* clustering — union-find over replayed ∪ fresh edges; duplicate edges are
  absorbed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.neardup import NearDupResult
from dedup_ray.sources.io import read_table
from dedup_ray.stages.cluster import cluster_stage
from dedup_ray.stages.exact import EDGE_SCHEMA, exact_tier, split_exact_tier
from dedup_ray.stages.join import attach_pair_attrs
from dedup_ray.stages.keys import (
    _col_uniques_task,
    _dup_union_phashes_task,
    _rekey_scan_file_task,
    exact_keys_stage,
)
from dedup_ray.stages.lsh import lsh_candidates
from dedup_ray.stages.report import cluster_stats
from dedup_ray.stages.signatures import signatures_stage
from dedup_ray.stages.verify import verify_stage
from dedup_ray.state.metrics import inc_counter, reset_counters, snapshot_counters


def run_neardup_incremental(
    prior_input: str,
    prior_ckpt_dir: str,
    delta_input: str,
    cfg: DedupConfig | None = None,
    concurrency: int | tuple[int, int] = 4,
    progress: bool = False,
) -> NearDupResult:
    """Cluster ``prior ∪ delta`` reusing ``prior_ckpt_dir`` (a completed
    ``run_neardup(prior_input, checkpoint_dir=...)``): prior decode output
    and prior verified near edges are replayed; decode, signatures and
    verification run for delta-touching work only."""
    cfg = cfg or DedupConfig()
    reset_counters()

    import sys
    import time as _time

    _t0 = _time.time()

    def _tick(stage: str) -> None:
        if progress:
            print(f"[{_time.time() - _t0:7.1f}s] stage {stage} done",
                  file=sys.stderr, flush=True)

    # replaying keys/edges from a checkpoint built under a DIFFERENT config
    # would be silently wrong (other thresholds -> other edges); refuse, the
    # same contract as Checkpointer's config-hash invalidation.
    import json

    manifest_p = os.path.join(prior_ckpt_dir, "manifest.json")
    try:
        with open(manifest_p) as f:
            stages = json.load(f)["stages"]
    except (OSError, ValueError, KeyError) as e:
        raise ValueError(
            f"{prior_ckpt_dir} is not a completed run_neardup checkpoint "
            f"(missing/unreadable manifest.json)"
        ) from e
    for need in ("keys", "edges_near"):
        ent = stages.get(need)
        if ent is None:
            raise ValueError(
                f"prior checkpoint lacks completed stage {need!r}; run "
                f"run_neardup({prior_input!r}, checkpoint_dir=...) to the end first"
            )
        got = ent.get("config_hash")
        if got is not None and got != cfg.config_hash():
            raise ValueError(
                f"prior checkpoint stage {need!r} was built under config hash "
                f"{got}, incremental run uses {cfg.config_hash()}; rebuild the "
                f"prior checkpoint or pass the matching DedupConfig"
            )

    # async pre-passes — tiny single-column reads that overlap the delta read
    union_dup_ref = (
        _dup_union_phashes_task.remote([prior_input, delta_input])
        if cfg.cascade_decode
        else None
    )
    delta_ph_ref = _col_uniques_task.remote(delta_input, "phash")
    delta_id_ref = _col_uniques_task.remote(delta_input, "image_id")

    # ---- rekey pre-scan: one remote task per prior-keys checkpoint file,
    # launched BEFORE the delta decode so the two overlap fully (the round-2
    # profile showed a 4 s driver barrier here at 50k rows) ------------------
    keys_dir = os.path.join(prior_ckpt_dir, "keys")
    rekey_refs = []
    if cfg.cascade_decode:
        # flat stage dir or partitioned_stage chunk subdirs — walk both
        key_files = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(keys_dir)
            for f in files
            if f.endswith(".parquet")
        )
        rekey_refs = [
            _rekey_scan_file_task.remote(f, delta_ph_ref) for f in key_files
        ]

    # ---- delta keys: the only full decode in the pipeline. LAZY: the only
    # driver barrier before the fused exact tier is the (cheap, plain-task)
    # rekey scan below, so the decode streams straight into the union
    # shuffle together with the prior-keys replay read — one overlapped
    # graph, mirroring run_neardup's shape. -------------------------------
    delta_keys = exact_keys_stage(
        read_table(delta_input), cfg, dup_ref=union_dup_ref
    )

    # ---- prior keys: replay; re-decode ONLY invalidated cascade sentinels -
    prior_keys = rd.read_parquet(keys_dir)
    rekey_ids = np.empty(0, dtype=object)
    if rekey_refs:
        # bounded driver materialization: ids of prior SENTINEL rows whose
        # phash collides with the delta — at most |delta| phash groups' worth
        parts = [a for a in ray.get(rekey_refs) if a.size]
        if parts:
            rekey_ids = np.sort(np.concatenate(parts))
        inc_counter("incremental_rekeyed_rows", int(rekey_ids.size))
        _tick("rekey_scan")

    def drop_rekeyed(b: pa.Table) -> pa.Table:
        if rekey_ids.size == 0:
            return b
        ids = np.asarray(b["image_id"].to_pylist(), dtype=object)
        pos = np.searchsorted(rekey_ids, ids)
        pos[pos >= rekey_ids.size] = rekey_ids.size - 1
        return b.filter(pa.array(rekey_ids[pos] != ids))

    keys = prior_keys.map_batches(drop_rekeyed, batch_format="pyarrow").union(
        delta_keys
    )
    if rekey_ids.size:
        rekeyed = exact_keys_stage(
            read_table(
                prior_input,
                filter=pc.field("image_id").isin(pa.array(list(rekey_ids))),
            ),
            cfg,
            dup_ref=union_dup_ref,
        )
        keys = keys.union(rekeyed)

    # ---- union exact tier (digest-only shuffle, no decode) ----------------
    fused = exact_tier(keys).materialize()
    _tick("union_exact_tier")
    edges_exact, reps, sizes = split_exact_tier(fused)
    sigs = signatures_stage(reps, cfg, concurrency).materialize()
    _tick("signatures")

    # ---- candidates: verify delta-touching pairs only ---------------------
    delta_ids = np.sort(ray.get(delta_id_ref).astype(object))

    n_reps = sigs.count()
    if n_reps == 0:
        near_new = rd.from_arrow(EDGE_SCHEMA.empty_table())
    else:
        from dedup_ray.stages.verify import verify_batch

        # int-encode boundary — same shape as run_neardup (stages/codes.py):
        # candidate generation, the delta filter, pair dedup, attach and
        # verify all run over int64 codes; edges decode inside the fused
        # verify task.
        nodes_ref = None
        sigs_lsh = sigs
        if cfg.int_encode_ids:
            from dedup_ray.stages.codes import (
                decode_edge_table,
                encode_id_col,
                sorted_id_dictionary,
            )

            nodes_ref = sorted_id_dictionary(sigs)
            if nodes_ref is not None:
                sigs_lsh = encode_id_col(sigs, nodes_ref)

        if nodes_ref is not None:
            # delta ids -> codes (ids that are not reps have no code and can
            # never appear in a candidate pair — drop them, same semantics
            # as the string membership test below)
            ns = ray.get(nodes_ref)
            pos = pc.index_in(
                pa.array(list(delta_ids), type=pa.string()), value_set=ns
            )
            delta_keys: np.ndarray = np.sort(
                pos.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            delta_keys = delta_ids

        def delta_touching(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or delta_keys.size == 0:
                return b.slice(0, 0)
            if pa.types.is_integer(b["src_id"].type):
                src = b["src_id"].to_numpy(zero_copy_only=False)
                dst = b["dst_id"].to_numpy(zero_copy_only=False)
            else:
                src = np.asarray(b["src_id"].to_pylist(), dtype=object)
                dst = np.asarray(b["dst_id"].to_pylist(), dtype=object)

            def member(a: np.ndarray) -> np.ndarray:
                pos = np.searchsorted(delta_keys, a)
                pos[pos >= delta_keys.size] = delta_keys.size - 1
                return delta_keys[pos] == a

            return b.filter(pa.array(member(src) | member(dst)))

        cands = lsh_candidates(
            sigs_lsh, cfg, n_reps=n_reps,
            id_type=pa.int64() if nodes_ref is not None else None,
        ).map_batches(delta_touching, batch_format="pyarrow")

        if nodes_ref is not None:
            def post(b):
                return decode_edge_table(verify_batch(b, cfg), nodes_ref)
        else:
            def post(b):
                return verify_batch(b, cfg)

        # verify fused into the attach task (post_fn) — see
        # pipelines/neardup._near_edges for the attach->verify traffic math
        id_t = pa.int64() if nodes_ref is not None else pa.string()
        near_new = attach_pair_attrs(
            cands, sigs_lsh,
            ["phash", "minhash_sig", "has_sig", "caption", "winnow_fp"],
            broadcast_max_rows=cfg.attach_broadcast_max_rows,
            post_fn=post,
            attrs_count=n_reps,
            pairs_schema=pa.schema([("src_id", id_t), ("dst_id", id_t)]),
        )

    # ---- replayed prior near edges + fresh edges -> clusters --------------
    prior_near = rd.read_parquet(os.path.join(prior_ckpt_dir, "edges_near"))
    edges = edges_exact.union(near_new.materialize()).union(prior_near)
    _tick("verify")
    clusters = cluster_stage(edges, cfg).materialize()
    _tick("clusters")

    total_rows = read_table(prior_input).count() + read_table(delta_input).count()
    counters = snapshot_counters()
    stats = cluster_stats(clusters, sizes, total_rows)
    _tick("stats")
    return NearDupResult(
        clusters=clusters,
        stats=stats,
        counters=counters,
        report={"stats": stats, "counters": counters, "groups_sample": None},
    )
