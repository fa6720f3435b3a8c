"""Command-line entry point — the analog of the reference CLI
(/root/reference/src/main.rs:15-70), table-model edition.

    python -m dedup_ray.cli run --input corpus/ [options]

Flags mirror the reference: size filters, include/exclude globs (on
image_id), output format human/json/quiet, --report-exit-code (exit 1 iff
duplicates exist, src/main.rs:221-225), --jobs (→ ray.init num_cpus), and an
apply step with --dry-run: instead of hardlinking files, `--action keep-one`
writes a DECISIONS table (keep/drop per dup row, keeper = cluster rep) —
dry-run prints counts without writing (src/actions.rs:35-115 analog; a
decisions table is the idempotent, retry-safe form of the mutation).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_glob_file(path: str) -> list[str]:
    """gitignore-style pattern file: trimmed lines, blanks/# dropped
    (~ /root/reference/src/main.rs:95-112, warn-and-empty on error)."""
    try:
        with open(path) as f:
            return [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.strip().startswith("#")
            ]
    except OSError as e:
        print(f"warning: cannot read pattern file {path}: {e}", file=sys.stderr)
        return []


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dedup_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="detect + cluster duplicates in a corpus table")
    r.add_argument("--input", required=True, help="corpus path (parquet/lance)")
    r.add_argument("--min-size", type=int, default=0)
    r.add_argument("--max-size", type=int, default=2**63 - 1)
    r.add_argument("--include", action="append", default=[], help="image_id glob")
    r.add_argument("--exclude", action="append", default=[], help="image_id glob")
    r.add_argument("--include-from", help="pattern file")
    r.add_argument("--exclude-from", help="pattern file")
    r.add_argument("--format", choices=["human", "json", "quiet"], default="human")
    r.add_argument("--verbose", action="store_true")
    r.add_argument("--report-exit-code", action="store_true",
                   help="exit 1 iff any duplicate cluster exists")
    r.add_argument("--jobs", type=int, default=None, help="CPU count for ray.init")
    r.add_argument("--progress", action="store_true",
                   help="live per-operator progress bars + stage lines "
                        "(reference indicatif bar analog, src/main.rs:173-204)")
    r.add_argument("--checkpoint", help="checkpoint directory (resumable)")
    r.add_argument("--prior-input", help="incremental mode: standing-corpus "
                   "table; --input becomes the delta batch")
    r.add_argument("--prior-checkpoint", help="incremental mode: completed "
                   "checkpoint dir of a prior run over --prior-input")
    r.add_argument("--output", help="write clusters parquet here")
    r.add_argument("--export", help="resumable partitioned export dir: one "
                   "atomically-committed part=NNNN/ per cluster_id hash "
                   "range; re-runs skip finished partitions")
    r.add_argument("--export-partitions", type=int, default=64)
    r.add_argument("--action", choices=["none", "keep-one"], default="none")
    r.add_argument("--decisions", help="output path for the decisions table")
    r.add_argument("--dry-run", action="store_true")
    return p


def cmd_run(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.jobs,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = bool(args.progress)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.neardup import run_neardup
    from dedup_ray.stages.report import print_human

    include = tuple(args.include + (parse_glob_file(args.include_from) if args.include_from else []))
    exclude = tuple(args.exclude + (parse_glob_file(args.exclude_from) if args.exclude_from else []))
    cfg = DedupConfig(
        min_size=args.min_size, max_size=args.max_size,
        include=include, exclude=exclude,
    )
    if args.prior_input and args.prior_checkpoint:
        if args.checkpoint:
            print("error: --checkpoint is not supported in incremental mode "
                  "(the incremental run replays --prior-checkpoint and does "
                  "not write one)", file=sys.stderr)
            return 2
        from dedup_ray.pipelines.incremental import run_neardup_incremental

        res = run_neardup_incremental(
            args.prior_input, args.prior_checkpoint, args.input, cfg=cfg,
            progress=args.progress,
        )
    elif args.prior_input or args.prior_checkpoint:
        print("error: incremental mode needs BOTH --prior-input and "
              "--prior-checkpoint", file=sys.stderr)
        return 2
    else:
        res = run_neardup(args.input, cfg=cfg, checkpoint_dir=args.checkpoint,
                          progress=args.progress)

    if args.output:
        res.clusters.write_parquet(args.output)

    if args.export:
        from dedup_ray.sources.export import export_partitioned

        stats = export_partitioned(
            res.clusters, args.export, key="cluster_id",
            num_partitions=args.export_partitions,
        )
        print(f"export: {stats['partitions_written']} partitions written, "
              f"{stats['partitions_skipped']} skipped, {stats['rows']} rows",
              file=sys.stderr)

    if args.action == "keep-one":
        decisions = res.clusters.map_batches(_decide, batch_format="pyarrow")
        n_drop = decisions.count() - res.stats["duplicate_clusters"]
        if args.dry_run:
            print(f"[dry-run] would drop {n_drop} duplicate rows "
                  f"(keeping one per {res.stats['duplicate_clusters']} clusters)",
                  file=sys.stderr)
        elif args.decisions:
            decisions.write_parquet(args.decisions)

    if args.format == "human":
        print(print_human(res.report, verbose=args.verbose))
    elif args.format == "json":
        print(json.dumps(res.report, indent=2, default=str))
    # quiet: no output (reference S5)

    if args.report_exit_code and res.stats["duplicate_clusters"] > 0:
        return 1
    return 0


def _decide(b):
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = pc.equal(b["image_id"], b["cluster_id"])  # keeper = cluster rep
    return pa.table(
        {
            "image_id": b["image_id"],
            "cluster_id": b["cluster_id"],
            "decision": pc.if_else(keep, pa.scalar("keep"), pa.scalar("drop")),
        }
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    return 2  # pragma: no cover


if __name__ == "__main__":
    raise SystemExit(main())
