"""The flagship pipeline: three-stage near-dup detection + clustering.

End-to-end dataflow (every box a Dataset, every arrow streaming):

    images ──map_batches──> keys (digests, NO bytes)
      keys ──groupby(pixel_hash)──> exact star edges          (tier 1)
      keys ──groupby(pixel,caption)──> reps (collapsed)
      reps ──actor pool──> signatures (minhash/winnow)
      sigs ──explode+groupby(band)──> candidate pairs          (tier 2+3 cand)
      pairs ──attach attrs──> ──actor pool verify──> near edges
      exact ∪ near edges ──union-find──> clusters
      clusters + keys ──groupby──> report stats

Mirrors the reference's scan -> size-group -> partial-hash -> full-hash
cascade (/root/reference/src/main.rs:155-205) with the same two invariants:
cheap keys only ever ADD candidates (recall-safe), the verify stage is
authoritative; and singletons exit early (HAVING n>=2 at every grouping).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.sources.io import read_table
from dedup_ray.stages.cluster import cluster_stage
from dedup_ray.stages.exact import exact_tier, split_exact_tier
from dedup_ray.stages.join import attach_pair_attrs
from dedup_ray.stages.keys import exact_keys_stage
from dedup_ray.stages.lsh import lsh_candidates
from dedup_ray.stages.report import cluster_stats, write_report
from dedup_ray.stages.signatures import signatures_stage
from dedup_ray.stages.verify import verify_stage
from dedup_ray.state.checkpoint import Checkpointer
from dedup_ray.state.metrics import reset_counters, snapshot_counters


@dataclass
class NearDupResult:
    clusters: rd.Dataset
    stats: dict
    counters: dict = field(default_factory=dict)
    report: dict = field(default_factory=dict)


def run_neardup(
    input_path: str,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    concurrency: int | tuple[int, int] = 4,
    compute_stats: bool = True,
    progress: bool = False,
) -> NearDupResult:
    """Run the full detector over an input_hint-shaped table.

    ``checkpoint_dir=None`` runs fully streaming (no mid-pipeline
    materialization beyond what groupbys require); with a directory, every
    stage boundary checkpoints per state/checkpoint.py and a second run
    resumes from the last completed stage.
    """
    cfg = cfg or DedupConfig()
    reset_counters()
    ckpt = Checkpointer(checkpoint_dir, cfg.config_hash())

    import sys
    import time as _time

    _t0 = _time.time()

    def _tick(stage: str) -> None:
        # live stage lines (reference indicatif-bar analog); the per-operator
        # bars themselves are Ray Data's own, toggled by the CLI --progress
        if progress:
            print(f"[{_time.time() - _t0:7.1f}s] stage {stage} materialized",
                  file=sys.stderr, flush=True)

    # A dataset consumed by MULTIPLE downstream stages must be pinned, or the
    # lazy DAG re-executes its whole lineage once per consumer. Checkpoint
    # mode pins to parquet (resumable); otherwise pin in the object store.
    def pin(ds: rd.Dataset, stage: str = "") -> rd.Dataset:
        if checkpoint_dir:
            return ds
        out = ds.materialize()
        if stage:
            _tick(stage)
        return out

    images = read_table(input_path)
    total_rows = images.count()  # metadata count, no scan

    # keys has ONE consumer (the fused exact tier) -> the decode stage
    # STREAMS into the shuffle with no materialization barrier; in
    # checkpoint mode the keys boundary is still persisted for resume.
    # the cascade pre-pass only needs phash: hand the stage the input PATH so
    # it runs as one async remote pyarrow column read overlapping the main
    # pipeline ramp (see keys.py — the driver never blocks on it)
    from dedup_ray.sources.io import list_shards

    shards = list_shards(input_path) if checkpoint_dir else []
    if len(shards) > 1:
        # PER-PARTITION lineage for the expensive decode stage (north_rule):
        # each chunk of input part files is computed and committed
        # independently, so a crash loses at most one chunk, not the stage.
        # The cascade pre-pass (global: dup phashes over the WHOLE input) is
        # hoisted to one async task shared by every chunk.
        from dedup_ray.stages.keys import _dup_phashes_task

        # submitted LAZILY on the first chunk that actually recomputes: a
        # fully-checkpointed resume must not pay the whole-corpus phash scan
        _dup_box: list = []

        def _chunk_fn(paths: list[str]) -> rd.Dataset:
            if cfg.cascade_decode and not _dup_box:
                _dup_box.append(_dup_phashes_task.remote(input_path))
            return exact_keys_stage(
                read_table(paths), cfg, dup_ref=_dup_box[0] if _dup_box else None
            )

        chunks = [
            shards[i : i + cfg.ckpt_chunk_files]
            for i in range(0, len(shards), cfg.ckpt_chunk_files)
        ]
        keys = ckpt.partitioned_stage("keys", chunks, _chunk_fn, ("input",))
    else:
        keys = ckpt.stage(
            "keys",
            lambda: exact_keys_stage(images, cfg, dup_phash_path=input_path),
            ("input",),
        )
    # fused exact tier: ONE shuffle yields star edges + collapsed reps +
    # (image_id, byte_len) size rows for the report
    fused = pin(ckpt.stage("exact_tier", lambda: exact_tier(keys), ("keys",)), "exact_tier")
    edges_exact, reps, sizes = split_exact_tier(fused)
    sigs = pin(ckpt.stage(
        "signatures", lambda: signatures_stage(reps, cfg, concurrency), ("exact_tier",)
    ), "signatures")

    # --- int-encode boundary (stages/codes.py): dictionary-encode rep ids
    # to sorted int64 codes ONCE; explode/bucket/pair-gen/pair-dedup/attach/
    # verify all run over zero-copy ints (string ids rode every one of those
    # shuffles ~60x multiplied — round-3 verdict weak #2); edges decode at
    # the sink. The dictionary is a deterministic function of the pinned
    # sigs table, so a checkpoint resume rebuilds identical codes.
    n_reps = sigs.count()  # pinned/checkpointed -> metadata, no scan
    nodes_ref = None
    sigs_lsh = sigs
    if cfg.int_encode_ids and n_reps > 0:
        from dedup_ray.stages.codes import encode_id_col, sorted_id_dictionary

        nodes_ref = sorted_id_dictionary(sigs)
        if nodes_ref is not None:
            sigs_lsh = encode_id_col(sigs, nodes_ref)
    cands = ckpt.stage(
        "candidates",
        lambda: lsh_candidates(
            sigs_lsh, cfg, n_reps=n_reps,
            id_type=pa.int64() if nodes_ref is not None else None,
        ),
        ("signatures",),
    )
    # lsh_candidates' explode+bitmap prepass is eager (buckets materialize at
    # construction): tick here so stage logs split the LSH window into
    # [signatures -> candidates_prepass] and [-> edges_near] (pair shuffle +
    # dedup + fused attach/verify)
    _tick("candidates_prepass")

    def _near_edges() -> rd.Dataset:
        from dedup_ray.stages.exact import EDGE_SCHEMA
        from dedup_ray.stages.verify import verify_batch

        if n_reps == 0:  # e.g. filters removed every row
            return rd.from_arrow(EDGE_SCHEMA.empty_table())
        # verify FUSED into the attach task (post_fn): attached batches are
        # ~kB/pair and reduce to ~tens of B per confirmed edge — fusing
        # keeps that blow-up out of the object store (profiled ~145 GB of
        # transient attach->verify traffic at 2M rows / 56M pairs, the
        # spill-stress driver; see stages/join.attach_pair_attrs). The edge
        # code->id decode is fused in the same task (edge rows are tiny but
        # a free fusion is free).
        if nodes_ref is not None:
            from dedup_ray.stages.codes import decode_edge_table

            def post(b):
                return decode_edge_table(verify_batch(b, cfg), nodes_ref)
        else:
            def post(b):
                return verify_batch(b, cfg)

        id_t = pa.int64() if nodes_ref is not None else pa.string()
        return attach_pair_attrs(
            cands, sigs_lsh,
            ["phash", "minhash_sig", "has_sig", "caption", "winnow_fp"],
            broadcast_max_rows=cfg.attach_broadcast_max_rows,
            post_fn=post,
            attrs_count=n_reps,
            pairs_schema=pa.schema([("src_id", id_t), ("dst_id", id_t)]),
        )

    # near_edges is PINNED even though it has one consumer: letting the
    # driver union-find's iter_batches stream the verify lineage throttles
    # the verify stage to the driver's consumption rate (measured 72 s
    # pinned vs 157 s streamed at 4 CPUs / 100k rows — backpressure tuned
    # for consumption, not completion).
    near_edges = pin(ckpt.stage("edges_near", _near_edges, ("candidates", "signatures")),
                     "edges_near")
    edges = edges_exact.union(near_edges)
    clusters = pin(ckpt.stage("clusters", lambda: cluster_stage(edges, cfg),
                              ("edges_exact", "edges_near")), "clusters")

    counters = snapshot_counters()
    stats = (
        cluster_stats(clusters, sizes, total_rows)
        if compute_stats
        else {"total_rows": total_rows}
    )
    # verbose sample: the 5 largest clusters — only when a report is being
    # persisted (the extra driver pass is not free on the bench hot path)
    sample = None
    if checkpoint_dir and stats.get("duplicate_clusters"):
        # distributed size count + top-5 — the driver sees 5 rows, never the
        # cluster table (round-2 review #7: to_pandas() here was a driver
        # OOM at 10^9 dup rows for a cosmetic sample). Tie order matches the
        # previous pandas nlargest (count desc, then cluster_id asc).
        top = (
            clusters.groupby("cluster_id")
            .count()
            .sort(["count()", "cluster_id"], descending=[True, False])
            .limit(5)
            .take_all()
        )
        sample = [
            {"cluster_id": r["cluster_id"], "n": int(r["count()"])} for r in top
        ]
    report = {"stats": stats, "counters": counters, "groups_sample": sample}
    if checkpoint_dir:
        report = write_report(
            stats, counters, os.path.join(checkpoint_dir, "report.json"),
            clusters_sample=sample,
        )
    return NearDupResult(clusters=clusters, stats=stats, counters=counters, report=report)


def phash_hamming_search(
    input_path: str, n_queries: int = 5, radius: int = 6
) -> rd.Dataset:
    """Image similarity search by perceptual hash: for each of the
    ``n_queries`` query images (lexicographically-smallest image_ids, a
    deterministic stand-in for user-supplied queries), every corpus image
    within Hamming distance ``radius`` of its phash:
    (query_id, image_id, dist), self-matches excluded.

    Scale shape: the query side is tiny BY DEFINITION (a search request),
    so it is resolved with one projection-pruned local-top-k pass and
    broadcast into a single streamed map over (image_id, phash) — per batch
    one vectorized XOR+popcount per query, no shuffle, no driver
    materialization of the corpus. A large STANDING query set would swap
    in the banded multi-index path (the flagship's phash band keys /
    ``embedding_neardup_lsh`` shape) behind the same output schema."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dedup_ray.functions.hashing import hamming64

    cols = read_table(input_path, columns=["image_id", "phash"])

    def local_min_k(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[("image_id", "ascending")])
        return b.take(idx[:n_queries])

    q = (
        cols.map_batches(local_min_k, batch_format="pyarrow")
        .sort("image_id")
        .limit(n_queries)
        .take_all()
    )
    q_ids = [r["image_id"] for r in q]
    q_hashes = np.array([r["phash"] for r in q], dtype=np.int64)

    out_schema = pa.schema(
        [("query_id", pa.string()), ("image_id", pa.string()),
         ("dist", pa.int64())]
    )

    def probe(b: pa.Table) -> pa.Table:
        ph = b["image_id"].to_numpy(zero_copy_only=False)
        h = b["phash"].to_numpy(zero_copy_only=False)
        outs = []
        for qi, qh in zip(q_ids, q_hashes):
            d = hamming64(h, np.full(len(h), qh, dtype=np.int64))
            keep = (d <= radius) & (ph != qi)
            if keep.any():
                outs.append(pa.table(
                    {"query_id": pa.array(np.full(int(keep.sum()), qi),
                                          type=pa.string()),
                     "image_id": pa.array(ph[keep], type=pa.string()),
                     "dist": pa.array(d[keep], type=pa.int64())}
                ))
        return pa.concat_tables(outs) if outs else out_schema.empty_table()

    return cols.map_batches(probe, batch_format="pyarrow")


def corpus_format_stats(input_path: str) -> rd.Dataset:
    """Per-format corpus profile over the image table: (fmt, n_images,
    total_bytes, mean_w) — the storage/compression dashboard view of the
    corpus (which codecs dominate, how wide the images run).

    Scale shape: per-batch Arrow group_by partials collapse each block to
    <= |formats| rows BEFORE the (tiny) groupby merge; ``bytes`` is length-
    reduced inside the scan task and never shuffles — the same bytes-stay-
    local rule as the flagship keys stage (stages/keys.py). mean_w rounds
    to 4 (cross-engine sum-order ulps)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_table(input_path, columns=["fmt", "w", "bytes"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "fmt": b["fmt"],
                "blen": pc.binary_length(b["bytes"]).cast(pa.int64()),
                "w": b["w"].cast(pa.int64()),
            }
        )
        g = t.group_by("fmt").aggregate(
            [("blen", "count", pc.CountOptions(mode="all")), ("blen", "sum"),
             ("w", "sum")]
        )
        return pa.table(
            {"fmt": g["fmt"], "pn": g["blen_count"], "pb": g["blen_sum"],
             "pw": g["w_sum"]}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("fmt").sum(
        ["pn", "pb", "pw"]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "fmt": b["fmt"],
                "n_images": b["sum(pn)"].cast(pa.int64()),
                "total_bytes": b["sum(pb)"].cast(pa.int64()),
                "mean_w": pc.round(
                    pc.divide(
                        b["sum(pw)"].cast(pa.float64()),
                        b["sum(pn)"].cast(pa.float64()),
                    ),
                    4,
                ),
            }
        ),
        batch_format="pyarrow",
    )


def rotation_invariant_clusters(input_path: str) -> rd.Dataset:
    """Rotation/flip-invariant exact dedup: clusters of images whose DECODED
    pixels are dihedral transforms of each other (same image rotated
    0/90/180/270 or mirrored) — the orbit-exact tier plain ``pixel_hash``
    cannot see: (image_id, cluster_id) member rows for clusters of >= 2,
    cluster_id = min member image_id.

    Key = ``dihedral_pixel_hash`` (min blake2b digest over the 8-transform
    group orbit, functions/hashing.py) computed INSIDE the scan-side decode
    task — bytes and pixels never shuffle, exactly the flagship keys-stage
    rule; then one hash-partitioned shuffle on the digest and a vectorized
    HAVING >= 2 run kernel. The orbit digest costs 8 pixel hashes per image
    (the decode still dominates). Rows-only query: binary decode is not
    SQL-expressible; tests/test_rotation.py checks against an in-process
    brute force AND the generator's planted rotated-duplicate ground truth
    (sources/corpus.py rot_dups)."""
    import numpy as np
    import pyarrow as pa

    from dedup_ray.functions import codecs
    from dedup_ray.functions.hashing import dihedral_pixel_hash
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_table(input_path, columns=["image_id", "bytes", "fmt"])

    def keys(b: pa.Table) -> pa.Table:
        n = b.num_rows
        data = b["bytes"]
        fmts = b["fmt"].to_pylist()
        dig = np.empty(n, dtype=object)
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
                dig[i] = dihedral_pixel_hash(px).hex()
            except Exception:
                ok[i] = False
                dig[i] = ""
        t = pa.table(
            {"image_id": b["image_id"],
             "dhash": pa.array(list(dig), type=pa.string())}
        )
        return t.filter(pa.array(ok))

    keyed = ds.map_batches(keys, batch_format="pyarrow", batch_size=256)

    out_schema = pa.schema(
        [("image_id", pa.string()), ("cluster_id", pa.string())]
    )

    def emit_clusters(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        dh = np.asarray(g["dhash"].to_pylist(), dtype=object)
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        starts = run_starts(dh)
        sizes = np.diff(np.append(starts, len(dh)))
        rep = np.repeat(ids[starts], sizes)  # sorted (dhash, id): min id first
        keep = np.repeat(sizes >= 2, sizes)
        return pa.table(
            {"image_id": pa.array(ids[keep], type=pa.string()),
             "cluster_id": pa.array(rep[keep], type=pa.string())}
        )

    return grouped_runs(
        keyed, "dhash", emit_clusters, sort_cols=["dhash", "image_id"]
    )


def caption_dup_images(input_path: str) -> rd.Dataset:
    """Label-conflict detection: caption groups whose members do NOT share
    image content — the mislabel/duplicate-caption signal a curation pass
    flags before training a captioner: (caption, n_rows, n_distinct_images)
    for captions with >= 2 rows and >= 2 distinct byte payloads. The empty
    caption is the planted hot key (FIXTURES §1) and surfaces as the
    largest group.

    Scale shape: ``bytes`` is digested to a 64-bit key INSIDE the scan task
    (the flagship's bytes-stay-local rule) and per-batch distinct
    (caption, digest, count) partials collapse each block before the one
    hash-partitioned caption shuffle; the run kernel is two reduceats.
    Oracle: GROUP BY caption with count(DISTINCT bytes) in DuckDB — the
    digest has no observable collisions at oracle scale, so values match."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_table(input_path, columns=["caption", "bytes"])

    def partial(b: pa.Table) -> pa.Table:
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(v.as_py(), digest_size=8).digest(), "big"
                )
                for v in b["bytes"]
            ),
            dtype=np.uint64,
            count=b.num_rows,
        )
        t = pa.table(
            {"caption": b["caption"], "h": pa.array(h, type=pa.uint64())}
        )
        g = t.group_by(["caption", "h"]).aggregate([([], "count_all")])
        return pa.table(
            {"caption": g["caption"], "h": g["h"],
             "cnt": g["count_all"].cast(pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    out_schema = pa.schema(
        [("caption", pa.string()), ("n_rows", pa.int64()),
         ("n_distinct_images", pa.int64())]
    )

    def stats_runs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        cap = np.asarray(g["caption"].to_pylist(), dtype=object)
        hv = g["h"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        starts = run_starts(cap)
        n = np.add.reduceat(cnt, starts)
        new_pair = np.ones(len(cap), dtype=np.int64)
        new_pair[1:] = ((cap[1:] != cap[:-1]) | (hv[1:] != hv[:-1])).astype(
            np.int64
        )
        nd = np.add.reduceat(new_pair, starts)
        keep = (n >= 2) & (nd >= 2)
        return pa.table(
            {
                "caption": pa.array(cap[starts][keep], type=pa.string()),
                "n_rows": pa.array(n[keep], type=pa.int64()),
                "n_distinct_images": pa.array(nd[keep], type=pa.int64()),
            }
        )

    return grouped_runs(parts, "caption", stats_runs, sort_cols=["caption", "h"])


def caption_quality(input_path: str) -> rd.Dataset:
    """Cross-modal reuse: the text-quality scorer applied to the image
    corpus's CAPTION column: (image_id, n_tokens, stopword_ratio,
    punct_ratio, mean_token_len). One projection-pruned streamed map —
    the image bytes never load. Demonstrates that every text operator runs
    unchanged over any table with a text column (the pipeline-step API is
    ``Dataset -> Dataset``); values stay bit-identical to the same DuckDB
    oracle as quality_scores."""
    import pyarrow as pa

    from dedup_ray.pipelines.analysis import QualityScorer

    ds = read_table(input_path, columns=["image_id", "caption"])
    scorer = QualityScorer()

    def score(b: pa.Table) -> pa.Table:
        out = scorer(
            pa.table({"doc_id": b["image_id"], "text": b["caption"]})
        )
        return out.rename_columns(
            ["image_id"] + out.column_names[1:]
        )

    return ds.map_batches(score, batch_format="pyarrow")


def decontaminate_images(
    input_path: str, eval_mod: int = 50, radius: int = 6
) -> rd.Dataset:
    """Cross-corpus image decontamination — the image analog of
    ``curation.decontaminate_docs``: flag training images whose perceptual
    hash is within Hamming ``radius`` of ANY held-out eval image:
    (image_id, eval_id, dist). Near-duplicate eval leakage is the
    train/test contamination mode exact byte matching misses (re-encoded,
    resized, slightly-cropped copies).

    The eval set here derives deterministically from the corpus (numeric
    id suffix % ``eval_mod`` == 0) so both engines agree on it; eval rows
    themselves are excluded from the train side. Scale shape: an eval set
    is small by definition — its (id, phash) pairs are collected once
    (bounded driver state) and broadcast into ONE streamed XOR+popcount
    map over the corpus projection; no shuffle, bytes never load. A large
    eval set would swap in the banded phash multi-index (the flagship's
    band keys) behind the same output schema, exactly like
    ``phash_hamming_search`` documents."""
    import numpy as np
    import pyarrow as pa

    from dedup_ray.functions.hashing import hamming64

    cols = read_table(input_path, columns=["image_id", "phash"])

    def eval_rows(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_numpy(zero_copy_only=False)
        suffix = np.array([int(s[4:]) for s in ids], dtype=np.int64)
        return b.filter(pa.array(suffix % eval_mod == 0))

    ev = cols.map_batches(eval_rows, batch_format="pyarrow").take_all()
    ev_ids = np.array([r["image_id"] for r in ev], dtype=object)
    ev_hashes = np.array([r["phash"] for r in ev], dtype=np.int64)
    ev_id_set = set(ev_ids.tolist())

    out_schema = pa.schema(
        [("image_id", pa.string()), ("eval_id", pa.string()),
         ("dist", pa.int64())]
    )

    def probe(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_numpy(zero_copy_only=False)
        h = b["phash"].to_numpy(zero_copy_only=False)
        train = np.array([i not in ev_id_set for i in ids], dtype=bool)
        ids, h = ids[train], h[train]
        outs = []
        for qi, qh in zip(ev_ids, ev_hashes):
            d = hamming64(h, np.full(len(h), qh, dtype=np.int64))
            keep = d <= radius
            if keep.any():
                outs.append(pa.table(
                    {"image_id": pa.array(ids[keep], type=pa.string()),
                     "eval_id": pa.array(
                         np.full(int(keep.sum()), qi), type=pa.string()),
                     "dist": pa.array(d[keep], type=pa.int64())}
                ))
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    return cols.map_batches(probe, batch_format="pyarrow")


def image_size_filter(input_path: str) -> rd.Dataset:
    """Metadata-only image quality gate — (fmt, n_total, n_kept,
    n_dropped): how many images per format survive the standard pre-train
    size policy (area >= 64x64 AND aspect ratio <= 4:1). The cheapest
    curation tier: decisions come from the (w, h) columns alone, so the
    read projects three columns and ``bytes`` never leaves storage — at
    100 TB this pass costs megabytes per block, not the corpus. The
    aspect test is integer cross-multiplication (max(w,h) <= 4*min(w,h)):
    no float ratios to disagree over. Per-batch Arrow group_by partials
    collapse each block to <= |formats| rows before the tiny fmt merge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_table(input_path, columns=["fmt", "w", "h"])

    def partial(b: pa.Table) -> pa.Table:
        w = b["w"].cast(pa.int64())
        h = b["h"].cast(pa.int64())
        area_ok = pc.greater_equal(pc.multiply(w, h), 4096)
        hi = pc.max_element_wise(w, h)
        lo = pc.min_element_wise(w, h)
        aspect_ok = pc.less_equal(hi, pc.multiply(lo, 4))
        keep = pc.and_(area_ok, aspect_ok).cast(pa.int64())
        t = pa.table({"fmt": b["fmt"], "k": keep})
        g = t.group_by("fmt").aggregate(
            [("k", "count", pc.CountOptions(mode="all")), ("k", "sum")]
        )
        return pa.table(
            {"fmt": g["fmt"], "pn": g["k_count"].cast(pa.int64()),
             "pk": g["k_sum"].cast(pa.int64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("fmt").sum(
        ["pn", "pk"]
    )
    schema = pa.schema(
        [("fmt", pa.string()), ("n_total", pa.int64()),
         ("n_kept", pa.int64()), ("n_dropped", pa.int64())]
    )

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(pn)" not in b.column_names:
            return schema.empty_table()
        n = b["sum(pn)"].cast(pa.int64())
        k = b["sum(pk)"].cast(pa.int64())
        return pa.table(
            {"fmt": b["fmt"], "n_total": n, "n_kept": k,
             "n_dropped": pc.subtract(n, k)}
        )

    return agg.map_batches(final, batch_format="pyarrow")


def caption_keep_best_image(input_path: str) -> rd.Dataset:
    """Caption-duplicate keeper with a QUALITY policy — one image survives
    per non-empty caption: the largest encoded file (most bits retained,
    the standard keep-least-compressed curation rule), tie-broken by min
    image_id; empty-caption rows are not duplicates of each other and
    pass through (the flagship's empty-caption convention,
    stages/signatures.py). Returns (image_id, w, h, n_bytes).

    File lengths come from Arrow's binary_length kernel — offset
    arithmetic, no decode — and ``bytes`` is dropped in the scan task, so only
    (id, caption, ints) ever shuffle. ONE caption shuffle (grouped_runs
    sorted by [caption, -n_bytes, image_id]) makes each group's winner
    its run head — no per-group Python, no driver materialization."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dedup_ray.stages.grouped import grouped_runs

    ds = read_table(input_path, columns=["image_id", "caption", "bytes", "w", "h"])

    def lengths(b: pa.Table) -> pa.Table:
        n = pc.binary_length(b["bytes"]).cast(pa.int64())
        return pa.table(
            {
                "image_id": b["image_id"],
                "caption": b["caption"],
                "w": b["w"].cast(pa.int64()),
                "h": b["h"].cast(pa.int64()),
                "n_bytes": n,
                "neg_bytes": pc.negate(n),
            }
        )

    slim = ds.map_batches(lengths, batch_format="pyarrow")
    out_cols = ["image_id", "w", "h", "n_bytes"]
    empties = slim.map_batches(
        lambda b: b.filter(pc.equal(b["caption"], "")).select(out_cols),
        batch_format="pyarrow",
    )
    dups = slim.map_batches(
        lambda b: b.filter(pc.not_equal(b["caption"], "")),
        batch_format="pyarrow",
    )

    def keep_head(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("image_id", pa.string()), ("w", pa.int64()),
                 ("h", pa.int64()), ("n_bytes", pa.int64())]
            ).empty_table()
        col = t["caption"].combine_chunks()
        neq = pc.not_equal(
            col.slice(1), col.slice(0, len(col) - 1)
        ).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        return t.take(pa.array(starts)).select(out_cols)

    kept = grouped_runs(
        dups, "caption", keep_head,
        sort_cols=["caption", "neg_bytes", "image_id"],
    )
    return kept.union(empties)


def aspect_bucket_batches(
    input_path: str, batch_size: int = 32, num_parts: int = 8
) -> rd.Dataset:
    """Aspect-ratio-bucketed training batches — the image-side analog of
    sequence packing (pipelines/curation.pack_sequences): vision training
    groups same-shape images so a batch resizes to one canvas. Each image
    is classed tall / wide / square by INTEGER cross-multiplication
    (3h > 4w etc. — no float ratios), routed to a deterministic partition
    (numeric id % num_parts, so batch assembly is partition-local and
    embarrassingly parallel at cluster scale — num_parts is the
    parallelism knob), and numbered into fixed-size batches in id order
    within (bucket, part). Metadata-only: the read projects (image_id,
    w, h); pixels never move. Returns (image_id, bucket, part, batch_id)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dedup_ray.stages.grouped import grouped_runs, run_ranks

    ds = read_table(input_path, columns=["image_id", "w", "h"])
    names = pa.array(["tall", "wide", "square"], pa.string())

    def classify(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = np.full(len(w), 2, dtype=np.int64)  # square
        code[3 * h > 4 * w] = 0  # tall
        code[3 * w > 4 * h] = 1  # wide
        nid = pc.cast(pc.utf8_slice_codeunits(b["image_id"], 4, 99), pa.int64())
        pt = nid.to_numpy(zero_copy_only=False) % num_parts
        return pa.table(
            {
                "image_id": b["image_id"],
                "code": pa.array(code),
                "part": pa.array(pt),
                "gkey": pa.array(code * num_parts + pt),
            }
        )

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("image_id", pa.string()), ("bucket", pa.string()),
                 ("part", pa.int64()), ("batch_id", pa.int64())]
            ).empty_table()
        g = t["gkey"].to_numpy(zero_copy_only=False)
        rk = run_ranks(g)
        return pa.table(
            {
                "image_id": t["image_id"],
                "bucket": names.take(t["code"]),
                "part": t["part"],
                "batch_id": pa.array(rk // batch_size),
            }
        )

    return grouped_runs(
        ds.map_batches(classify, batch_format="pyarrow"),
        "gkey", number, sort_cols=["gkey", "image_id"],
    )


def quadrant_crop_pairs(input_path: str) -> rd.Dataset:
    """Exact CROP-duplicate tier: pairs of images where one's full frame is
    pixel-identical to a quadrant of the other (or two images share an
    identical quadrant) — the partial-image duplicate that pixel_hash
    (whole frame) and the dihedral orbit (rotations) both miss. Returns
    (a, b, role_a, role_b): role says which region matched ('full' or
    quadrant tl/tr/bl/br), a < b by image_id.

    Each image posts FIVE digest rows from the same scan-side decode
    (full + 4 floor-half quadrants; the digest is blake2b over
    shape-tagged pixel bytes, so only true region-identical matches
    collide) — bytes and pixels never shuffle, the flagship keys rule.
    ONE hash-partitioned shuffle on the digest; pair generation is the
    vectorized HAVING>=2 run kernel. Exact by construction: no verify
    tier needed (64-bit blake2b, collision-free at corpus scale — same
    argument as caption_dup_images). Rows-only query: binary decode is
    not SQL-expressible; tests/test_crop.py checks planted quadrant
    crops and a no-false-positive control."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from dedup_ray.functions import codecs
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_table(input_path, columns=["image_id", "bytes", "fmt"])

    def _dig(p: "np.ndarray") -> int:
        tag = p.shape[0].to_bytes(4, "big") + p.shape[1].to_bytes(4, "big")
        return int.from_bytes(
            hashlib.blake2b(
                tag + np.ascontiguousarray(p).tobytes(), digest_size=8
            ).digest(),
            "big",
        ) >> 1  # keep positive in int64

    def keys(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        fmts = b["fmt"].to_pylist()
        data = b["bytes"]
        out_dig: list[int] = []
        out_id: list[str] = []
        out_role: list[str] = []
        for i in range(b.num_rows):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
            except Exception:
                continue  # unreadable rows drop, flagship validity rule
            h, w = px.shape[0], px.shape[1]
            regions = (
                ("full", px),
                ("tl", px[: h // 2, : w // 2]),
                ("tr", px[: h // 2, w // 2 :]),
                ("bl", px[h // 2 :, : w // 2]),
                ("br", px[h // 2 :, w // 2 :]),
            )
            for role, p in regions:
                if p.size == 0:
                    continue
                out_dig.append(_dig(p))
                out_id.append(ids[i])
                out_role.append(role)
        return pa.table(
            {
                "dig": pa.array(out_dig, pa.int64()),
                "image_id": pa.array(out_id, pa.string()),
                "role": pa.array(out_role, pa.string()),
            }
        )

    schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()),
         ("role_a", pa.string()), ("role_b", pa.string())]
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        keys_np = g["dig"].to_numpy(zero_copy_only=False)
        starts = run_starts(keys_np)
        bounds = np.append(starts, len(keys_np))
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        roles = np.asarray(g["role"].to_pylist(), dtype=object)
        out_a, out_b, out_ra, out_rb = [], [], [], []
        for r in np.flatnonzero(np.diff(bounds) >= 2):
            lo, hi = bounds[r], bounds[r + 1]
            order = np.argsort(ids[lo:hi], kind="stable")
            rid = ids[lo:hi][order]
            rrole = roles[lo:hi][order]
            iu, ju = np.triu_indices(len(rid), 1)
            m = rid[iu] != rid[ju]  # self-matches (symmetric images) drop
            out_a.append(rid[iu][m])
            out_b.append(rid[ju][m])
            out_ra.append(rrole[iu][m])
            out_rb.append(rrole[ju][m])
        if not out_a:
            return schema.empty_table()
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.string()),
                "b": pa.array(np.concatenate(out_b), pa.string()),
                "role_a": pa.array(np.concatenate(out_ra), pa.string()),
                "role_b": pa.array(np.concatenate(out_rb), pa.string()),
            }
        )

    exploded = ds.map_batches(keys, batch_format="pyarrow")
    return grouped_runs(exploded, "dig", pairs, sort_cols=["dig", "image_id"])


def phash_distance_histogram(input_path: str, n_probes: int = 64) -> rd.Dataset:
    """Perceptual-hash distance profile — (hamming_dist, n_pairs): the
    distribution of phash Hamming distances between a fixed probe set
    (the n_probes lexicographically-first image_ids) and every other
    image. This is the diagnostic that picks/validates the verify
    threshold: near-dup corpora show a bimodal histogram (a ~0-distance
    spike + the ~32-centered random mass). Probes broadcast once
    (ray.put); each batch does one vectorized XOR-popcount against the
    probe vector and emits a 65-bin partial — the full pair matrix is
    never materialized. Oracle: DuckDB bit_count(xor(...)) over the same
    probe subquery."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from dedup_ray.functions.hashing import hamming64

    ds = read_table(input_path, columns=["image_id", "phash"])

    # probe selection: per-batch local head prunes to <= n_probes rows
    # BEFORE anything reaches the driver (local-topk recipe)
    def probe_partial(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=[("image_id", "ascending")])
        return b.take(order[:n_probes])

    blocks = [
        t for t in ray.get(
            ds.map_batches(probe_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and "image_id" in t.column_names
    ]
    if not blocks:
        return rd.from_arrow(
            pa.schema([("hamming_dist", pa.int64()),
                       ("n_pairs", pa.int64())]).empty_table()
        )
    merged = pa.concat_tables(blocks)
    order = pc.sort_indices(merged, sort_keys=[("image_id", "ascending")])
    probes = merged.take(order[:n_probes])
    probe_ids = np.asarray(probes["image_id"].to_pylist(), dtype=object)
    probe_ph = probes["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put((probe_ids, probe_ph))

    def hist_partial(b: pa.Table) -> pa.Table:
        ids_p, ph_p = ray.get(ref)
        ids = np.asarray(b["image_id"].to_pylist(), dtype=object)
        ph = b["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.zeros(65, dtype=np.int64)
        for j in range(len(ids_p)):  # n_probes is a small constant
            d = hamming64(ph, np.full(len(ph), ph_p[j]))
            keep = ids != ids_p[j]  # exclude self-pairs
            counts += np.bincount(d[keep], minlength=65)
        return pa.table(
            {"hamming_dist": pa.array(np.arange(65, dtype=np.int64)),
             "pn": pa.array(counts)}
        )

    agg = ds.map_batches(hist_partial, batch_format="pyarrow").groupby(
        "hamming_dist"
    ).sum("pn")
    schema = pa.schema([("hamming_dist", pa.int64()), ("n_pairs", pa.int64())])
    return agg.map_batches(
        lambda b: (
            pa.table(
                {"hamming_dist": b["hamming_dist"],
                 "n_pairs": b["sum(pn)"].cast(pa.int64())}
            ).filter(pc.greater(b["sum(pn)"].cast(pa.int64()), 0))
            if b.num_rows and "sum(pn)" in b.column_names
            else schema.empty_table()
        ),
        batch_format="pyarrow",
    )


def neardup_quality_eval(input_path: str):
    """Dup-pair recall + precision of the flagship detector against the
    corpus's planted ground truth — the acceptance metric ("dup-pair recall
    >= 0.99 vs reference clusters") surfaced as a first-class operator, so a
    production run can gate promotion on it instead of trusting the config.

    Pair-level definitions over unordered image pairs:

        gt_pairs      = sum over gt clusters      of C(n, 2)
        pred_pairs    = sum over detected clusters of C(n, 2)
        matched_pairs = sum over (gt, pred) cells  of C(n, 2)
        recall        = matched / gt_pairs,  precision = matched / pred_pairs

    Output: one row per planted dup_class (recall broken down by class —
    threshold-tail misses in the sampled-edit classes show up HERE, e.g. a
    caption_near member whose edit landed below the Jaccard threshold is
    out of the detector's threshold contract and lowers only that class's
    row) plus a ``__all__`` row carrying the corpus-wide recall AND the
    precision denominator (pred pairs don't decompose by class: a false
    positive can span classes).

    Scale shape: pairs are NEVER materialized — every term folds from run
    lengths of sorted key columns. Predicted labels attach to ground-truth
    rows via ONE image_id-keyed shuffle_join (big-big safe: the gt table is
    the corpus size); the recall terms fold inside ONE gt-keyed
    ``grouped_runs`` (sorted by (gt, label), so both the per-gt-cluster and
    the per-cell run lengths come from the same pass); the precision
    denominator folds inside one label-keyed pass over the detector output.
    Driver state: one partial row per bucket. Rows not in any detected
    cluster count as singleton predictions (zero pairs) via
    coalesce(label, image_id).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from dedup_ray.stages.grouped import grouped_runs, run_starts
    from dedup_ray.stages.join import shuffle_join

    res = run_neardup(input_path)
    pred = res.clusters  # (cluster_id, image_id): members of size>=2 clusters
    gt = read_table(
        os.path.join(os.path.dirname(input_path), "gt_clusters.parquet"),
        columns=["image_id", "gt_cluster_id", "dup_class"],
    )

    gt_schema = pa.schema(
        [("image_id", pa.string()), ("gt_cluster_id", pa.string()),
         ("dup_class", pa.string())]
    )
    pred_schema = pa.schema(
        [("cluster_id", pa.string()), ("image_id", pa.string())]
    )
    joined = shuffle_join(
        gt, pred, on="image_id", how="left",
        left_schema=gt_schema, right_schema=pred_schema,
    )

    lab_schema = pa.schema(
        [("gt_cluster_id", pa.string()), ("dup_class", pa.string()),
         ("label", pa.string())]
    )

    def fill_singletons(b: pa.Table) -> pa.Table:
        if not b.num_rows or "image_id" not in b.column_names:
            return lab_schema.empty_table()
        return pa.table(
            {"gt_cluster_id": b["gt_cluster_id"],
             "dup_class": b["dup_class"],
             "label": pc.coalesce(b["cluster_id"], b["image_id"])}
        )

    labeled = joined.map_batches(fill_singletons, batch_format="pyarrow")

    def pairs_of(sizes: np.ndarray) -> np.ndarray:
        return sizes * (sizes - 1) // 2

    def gt_kernel(g: pa.Table) -> pa.Table:
        # one partial row per dup_class present in the bucket (a gt cluster
        # has exactly one class, so class partials fold from cluster runs)
        gk = g["gt_cluster_id"].to_numpy(zero_copy_only=False)
        lb = g["label"].to_numpy(zero_copy_only=False)
        cl = g["dup_class"].to_numpy(zero_copy_only=False)
        n = len(gk)
        gs = run_starts(gk)
        gsz = np.diff(np.append(gs, n))
        gp = pairs_of(gsz)  # per gt cluster
        cell = np.concatenate(
            [[0], np.flatnonzero((gk[1:] != gk[:-1]) | (lb[1:] != lb[:-1])) + 1]
        ) if n else np.empty(0, dtype=np.int64)
        csz = np.diff(np.append(cell, n))
        # matched pairs per gt cluster: cells nest inside clusters, so sum
        # cell-pair counts over each cluster's cell range
        cell_cluster = np.searchsorted(gs, cell, side="right") - 1
        mp = np.bincount(cell_cluster, weights=pairs_of(csz),
                         minlength=len(gs)).astype(np.int64)
        cls_of_cluster = cl[gs]
        order = np.argsort(cls_of_cluster, kind="stable")
        co = cls_of_cluster[order]
        starts = run_starts(co)
        bounds = np.append(starts, len(co))
        out_cls, out_gt, out_m, out_n = [], [], [], []
        for i in range(len(starts)):
            sel = order[bounds[i]:bounds[i + 1]]
            out_cls.append(co[starts[i]])
            out_gt.append(int(gp[sel].sum()))
            out_m.append(int(mp[sel].sum()))
            out_n.append(int(gsz[sel].sum()))
        return pa.table(
            {"dup_class": pa.array(out_cls, type=pa.string()),
             "gt_pairs": pa.array(out_gt, type=pa.int64()),
             "matched_pairs": pa.array(out_m, type=pa.int64()),
             "n_images": pa.array(out_n, type=pa.int64())}
        )

    gt_parts = grouped_runs(
        labeled, "gt_cluster_id", gt_kernel,
        sort_cols=["gt_cluster_id", "label"],
    ).take_all()

    def pred_kernel(g: pa.Table) -> pa.Table:
        ck = g["cluster_id"].to_numpy(zero_copy_only=False)
        sz = np.diff(np.append(run_starts(ck), len(ck)))
        return pa.table(
            {"pred_pairs": pa.array([int(pairs_of(sz).sum())], type=pa.int64())}
        )

    pred_parts = grouped_runs(
        pred.select_columns(["cluster_id"]), "cluster_id", pred_kernel
    ).take_all()
    pred_pairs = sum(r["pred_pairs"] for r in pred_parts)

    agg: dict[str, list[int]] = {}
    for r in gt_parts:
        a = agg.setdefault(r["dup_class"], [0, 0, 0])
        a[0] += r["gt_pairs"]; a[1] += r["matched_pairs"]; a[2] += r["n_images"]
    rows = []
    tot = [0, 0, 0]
    for cls in sorted(agg):
        g, m, ni = agg[cls]
        tot[0] += g; tot[1] += m; tot[2] += ni
        rows.append({"dup_class": cls, "n_images": ni, "gt_pairs": g,
                     "matched_pairs": m,
                     "pair_recall": (m / g) if g else 1.0,
                     "pred_pairs": None, "pair_precision": None})
    rows.append({
        "dup_class": "__all__", "n_images": tot[2], "gt_pairs": tot[0],
        "matched_pairs": tot[1],
        "pair_recall": (tot[1] / tot[0]) if tot[0] else 1.0,
        "pred_pairs": int(pred_pairs),
        "pair_precision": (tot[1] / pred_pairs) if pred_pairs else 1.0,
    })
    return pd.DataFrame(rows)


def phash_bitplane_stats(input_path: str):
    """Per-bitplane balance of the corpus phash column: for bit i in 0..63,
    how many rows have it set and the set fraction. The SimHash-over-phash-
    bitplanes detector tier assumes roughly balanced bitplanes (a bit stuck
    at 0/1 contributes nothing to banding and silently weakens LSH recall)
    — this is the audit an operator runs when a new corpus or a new phash
    implementation lands.

    Shuffle-free: each batch folds to one 64-long int partial (vectorized
    (ph >> i) & 1 over a broadcasted bit axis); the driver merges partials
    bounded by 64 x n_blocks and finishes with single exact-int divisions,
    so the doubles match the SQL oracle bit-for-bit at any corpus size.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    cols = read_table(input_path, columns=["phash"])
    bits = np.arange(64, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        set_counts = ((ph[:, None] >> bits[None, :]) & 1).sum(axis=0)
        return pa.table(
            {"bit": pa.array(bits),
             "n_set": pa.array(set_counts.astype(np.int64)),
             "n_rows": pa.array(np.full(64, len(ph), dtype=np.int64))}
        )

    n_set = np.zeros(64, dtype=object)  # Python ints: no overflow at scale
    n_rows = 0
    for t in ray.get(
        cols.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "bit" in t.column_names:
            bi = t["bit"].to_numpy(zero_copy_only=False)
            ns = t["n_set"].to_numpy(zero_copy_only=False)
            nr = t["n_rows"].to_numpy(zero_copy_only=False)
            for j in range(len(bi)):
                n_set[bi[j]] += int(ns[j])
            # one 64-row partial per processed batch; blocks may pack
            # several — count each batch's row total exactly once (bit 0)
            n_rows += int(nr[bi == 0].sum())
    return pd.DataFrame(
        {"bit": bits,
         "n_set": [int(x) for x in n_set],
         "n_rows": np.full(64, n_rows, dtype=np.int64),
         "set_fraction": [
             (int(x) / n_rows) if n_rows else 0.0 for x in n_set
         ]}
    )


def corpus_dup_estimate(input_path: str):
    """Decode-free pre-flight duplicate estimate: row count, exact distinct
    phash / caption counts, and the phash-collapse dup-ratio upper bound
    (pixel-equal rows share a phash, so 1 - distinct_phash/rows bounds the
    exact-tier dup ratio from above). An operator runs THIS before
    committing a 100-TB flagship run: the dup ratio drives cascade-decode
    work (README.md:125-146 of the reference — work scales with dups, not
    corpus), so the estimate is the sizing input for decode concurrency
    and checkpoint cadence.

    Scale shape: each distinct count rides ONE column-projected
    grouped_runs shuffle whose kernel emits a per-bucket distinct-run
    count — only integers leave buckets, the driver folds one int per
    bucket. At extreme cardinality the documented swap is the HLL sketch
    (``approx_distinct_users``'s mergeable-register shape) at <6% error.
    The final ratios are single exact-int double divisions, matching the
    SQL oracle bit-for-bit.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from dedup_ray.stages.grouped import grouped_runs, run_starts

    def distinct_count(col: str) -> tuple[int, int]:
        ds = read_table(input_path, columns=[col])

        def kernel(g: pa.Table) -> pa.Table:
            keys = g[col].to_numpy(zero_copy_only=False)
            return pa.table(
                {"nd": pa.array([len(run_starts(keys))], pa.int64()),
                 "n": pa.array([len(keys)], pa.int64())}
            )

        nd = n = 0
        for t in ray.get(
            grouped_runs(ds, col, kernel).to_arrow_refs()
        ):
            if t.num_rows and "nd" in t.column_names:
                nd += sum(t["nd"].to_pylist())
                n += sum(t["n"].to_pylist())
        return nd, n

    nd_phash, n_rows = distinct_count("phash")
    nd_caption, _ = distinct_count("caption")
    return pd.DataFrame(
        [{
            "n_rows": int(n_rows),
            "n_distinct_phash": int(nd_phash),
            "n_distinct_caption": int(nd_caption),
            "phash_dup_ratio": (
                1 - (nd_phash / n_rows) if n_rows else 0.0
            ),
            "caption_dup_ratio": (
                1 - (nd_caption / n_rows) if n_rows else 0.0
            ),
        }]
    )


def wasted_bytes_by_fmt(input_path: str):
    """Per-format breakdown of duplicate waste: for every non-keeper member
    of a detected cluster, its byte cost attributed to its source format —
    (fmt, n_dup_rows, wasted_bytes). The operational question behind the
    reference's single wasted-bytes total (src/main.rs report): WHICH codec
    family pays for the duplication decides where re-encoding or stricter
    admission buys the most storage back. Σ wasted_bytes equals the
    flagship report's total exactly (pytest cross-check).

    Scale shape: byte_len is computed at the read (bytes never enter any
    shuffle); members join to their sizes via ONE image_id-keyed
    shuffle_join (big-big safe); per-batch (fmt, n, bytes) partials fold
    driver-side bounded by the format vocabulary.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from dedup_ray.stages.join import shuffle_join

    res = run_neardup(input_path)

    def non_keepers(b: pa.Table) -> pa.Table:
        if not b.num_rows or "image_id" not in b.column_names:
            return pa.schema([("image_id", pa.string())]).empty_table()
        keep = pc.not_equal(b["image_id"], b["cluster_id"])
        return pa.table({"image_id": b["image_id"].filter(keep)})

    dups = res.clusters.map_batches(non_keepers, batch_format="pyarrow")

    def sizes(b: pa.Table) -> pa.Table:
        return pa.table(
            {"image_id": b["image_id"],
             "fmt": b["fmt"],
             "byte_len": pc.binary_length(b["bytes"]).cast(pa.int64())}
        )

    size_ds = read_table(
        input_path, columns=["image_id", "fmt", "bytes"]
    ).map_batches(sizes, batch_format="pyarrow")

    joined = shuffle_join(
        dups, size_ds, on="image_id", how="inner",
        left_schema=pa.schema([("image_id", pa.string())]),
        right_schema=pa.schema(
            [("image_id", pa.string()), ("fmt", pa.string()),
             ("byte_len", pa.int64())]
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        if not b.num_rows or "fmt" not in b.column_names:
            return pa.schema(
                [("fmt", pa.string()), ("n", pa.int64()),
                 ("wb", pa.int64())]
            ).empty_table()
        g = b.group_by("fmt").aggregate(
            [("byte_len", "count"), ("byte_len", "sum")]
        )
        return pa.table(
            {"fmt": g["fmt"],
             "n": g["byte_len_count"].cast(pa.int64()),
             "wb": g["byte_len_sum"].cast(pa.int64())}
        )

    acc: dict[str, list[int]] = {}
    for t in ray.get(
        joined.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if t.num_rows and "fmt" in t.column_names:
            for f, n, wb in zip(t["fmt"].to_pylist(), t["n"].to_pylist(),
                                t["wb"].to_pylist()):
                a = acc.setdefault(f, [0, 0])
                a[0] += n; a[1] += wb
    fmts = sorted(acc)
    return pd.DataFrame(
        {"fmt": fmts,
         "n_dup_rows": [acc[f][0] for f in fmts],
         "wasted_bytes": [acc[f][1] for f in fmts]}
    )


def letterbox_crop(px):
    """Canonical uniform-border strip, applied to fixpoint: from each of the
    four edges, strip the maximal run of full rows/cols that are entirely
    the color of that edge's corner pixel (top/left anchor = px[0,0],
    bottom/right anchor = px[-1,-1], so one-sided bars and two-tone frames
    both strip). Deterministic and idempotent — letterboxed / pillarboxed /
    framed re-posts of the same content all canonicalize to the same pixel
    array (nested borders handled by the fixpoint loop). An all-constant
    image is returned unchanged (no content to anchor on)."""
    import numpy as np

    def _run(uniform: np.ndarray) -> int:
        # length of the leading True run
        nz = np.flatnonzero(~uniform)
        return int(nz[0]) if nz.size else len(uniform)

    while True:
        h, w = px.shape[0], px.shape[1]
        top = (px == px[0, 0]).all(axis=(1, 2))
        bot = (px == px[-1, -1]).all(axis=(1, 2))
        left = (px == px[0, 0]).all(axis=(0, 2))
        right = (px == px[-1, -1]).all(axis=(0, 2))
        r0, r1 = _run(top), h - _run(bot[::-1])
        c0, c1 = _run(left), w - _run(right[::-1])
        if r0 >= r1 or c0 >= c1:
            return px  # stripping would leave nothing: no content to anchor
        if r0 == 0 and c0 == 0 and r1 == h and c1 == w:
            return px
        px = px[r0:r1, c0:c1]


def letterbox_dedup_clusters(input_path: str) -> rd.Dataset:
    """Letterbox/frame-invariant exact dedup: clusters of images whose
    DECODED pixels are identical after stripping uniform-color borders —
    the re-post tier plain ``pixel_hash`` cannot see (letterboxed,
    pillarboxed or framed copies of the same content):
    (image_id, cluster_id) member rows for clusters of >= 2, cluster_id =
    min member image_id.

    Key = pixel_hash(letterbox_crop(pixels)), computed INSIDE the
    scan-side decode task — bytes and pixels never shuffle (the flagship
    keys-stage rule); then one hash-partitioned shuffle on the digest and
    a vectorized HAVING >= 2 run kernel, exactly the
    ``rotation_invariant_clusters`` shape. The canonical crop is exact
    (no threshold), so grouping is equality — no verify tier needed.
    Rows-only query: binary decode is not SQL-expressible;
    tests/test_letterbox.py checks planted padded-copy ground truth plus
    kernel properties (idempotence, nested borders, all-constant)."""
    import numpy as np
    import pyarrow as pa

    from dedup_ray.functions import codecs
    from dedup_ray.functions.hashing import pixel_hash
    from dedup_ray.stages.grouped import grouped_runs, run_starts

    ds = read_table(input_path, columns=["image_id", "bytes", "fmt"])

    def keys(b: pa.Table) -> pa.Table:
        n = b.num_rows
        data = b["bytes"]
        fmts = b["fmt"].to_pylist()
        dig = np.empty(n, dtype=object)
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
                dig[i] = pixel_hash(letterbox_crop(px)).hex()
            except Exception:
                ok[i] = False
                dig[i] = ""
        t = pa.table(
            {"image_id": b["image_id"],
             "lhash": pa.array(list(dig), type=pa.string())}
        )
        return t.filter(pa.array(ok))

    keyed = ds.map_batches(keys, batch_format="pyarrow", batch_size=256)

    out_schema = pa.schema(
        [("image_id", pa.string()), ("cluster_id", pa.string())]
    )

    def emit_clusters(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        lh = np.asarray(g["lhash"].to_pylist(), dtype=object)
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        starts = run_starts(lh)
        sizes = np.diff(np.append(starts, len(lh)))
        rep = np.repeat(ids[starts], sizes)  # sorted (lhash, id): min id first
        keep = np.repeat(sizes >= 2, sizes)
        return pa.table(
            {"image_id": pa.array(ids[keep], type=pa.string()),
             "cluster_id": pa.array(rep[keep], type=pa.string())}
        )

    return grouped_runs(
        keyed, "lhash", emit_clusters, sort_cols=["lhash", "image_id"]
    )


def letterbox_stats(input_path: str) -> "pd.DataFrame":
    """Corpus letterboxing audit: how many images carry a uniform-color
    border and how much of their area it wastes — the pre-flight sizing
    input for ``letterbox_dedup_clusters`` (run the strip tier only when
    the corpus actually contains framed re-posts, the same role
    ``corpus_dup_estimate`` plays for the cascade): one row
    (n_images, n_letterboxed, letterboxed_frac, mean_border_area_frac).

    Scale shape: decode + canonical crop happen INSIDE the scan task;
    each batch folds to three scalars (count, bordered count, border-area
    sum) — no shuffle at all, driver state is one partial row per block.
    Rows-only: binary decode is non-SQL; pytest replays the kernel on a
    planted padded corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from dedup_ray.functions import codecs

    ds = read_table(input_path, columns=["bytes", "fmt"])

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        data = b["bytes"]
        fmts = b["fmt"].to_pylist()
        n_ok = 0
        n_box = 0
        area = 0.0
        for i in range(n):
            try:
                px = codecs.decode(data[i].as_py(), fmts[i])
            except Exception:
                continue
            n_ok += 1
            c = letterbox_crop(px)
            if c.shape != px.shape:
                n_box += 1
                area += 1.0 - (c.shape[0] * c.shape[1]) / (
                    px.shape[0] * px.shape[1]
                )
        return pa.table(
            {"n": pa.array([n_ok], pa.int64()),
             "nb": pa.array([n_box], pa.int64()),
             "area": pa.array([area], pa.float64())}
        )

    n_tot = n_box = 0
    area = 0.0
    for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .to_arrow_refs()
    ):
        if t.num_rows and "n" in t.column_names:
            # one partial ROW per processed batch; blocks may pack several
            n_tot += int(pa.compute.sum(t["n"]).as_py())
            n_box += int(pa.compute.sum(t["nb"]).as_py())
            area += float(pa.compute.sum(t["area"]).as_py())
    return pd.DataFrame(
        [{
            "n_images": n_tot,
            "n_letterboxed": n_box,
            "letterboxed_frac": round(n_box / n_tot, 8) if n_tot else 0.0,
            "mean_border_area_frac": round(area / n_box, 8) if n_box else 0.0,
        }]
    )
