"""Per-stage checkpointing with lineage + counters (north_rule requirement).

Generalizes the reference's crash-safe apply step — temp + atomic rename +
leftover cleanup (/root/reference/src/actions.rs:118-136, bugfix
CHANGELOG.md:10-14) — one level up, to every stage boundary:

* a stage's output is a parquet DIRECTORY written to ``<name>.tmp`` and
  ``os.rename``d into place — a crash mid-write leaves only a temp dir,
  which the next run removes and rewrites;
* ``manifest.json`` records, per completed stage: row count, the pipeline
  config hash (a changed config invalidates everything), input lineage and
  the counter snapshot — the "per-partition signature and edge state with
  lineage + counters" of the north star;
* resume = skip any stage already in the manifest with a matching config
  hash and read its parquet back instead (kill/resume tests assert
  byte-identical final clusters);
* PER-PARTITION lineage (``partitioned_stage``): a multi-shard input runs
  the expensive decode stage as independently-committed chunks of part
  files, each manifest entry recording the exact input paths it derives
  from — a crash loses at most one chunk, and resume recomputes only
  missing/relocated chunks. At 100 TB this is the difference between
  re-decoding a stage and re-decoding ~8 files.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data as rd

from dedup_ray.state.metrics import snapshot_counters


class Checkpointer:
    def __init__(self, ckpt_dir: str | None, config_hash: str) -> None:
        self.dir = ckpt_dir
        self.config_hash = config_hash
        self.manifest: dict = {"config_hash": config_hash, "stages": {}}
        if ckpt_dir:
            os.makedirs(ckpt_dir, exist_ok=True)
            mpath = self._manifest_path()
            if os.path.exists(mpath):
                with open(mpath) as f:
                    prior = json.load(f)
                if prior.get("config_hash") == config_hash:
                    self.manifest = prior
                # else: config changed -> prior outputs invalid, start fresh
            self._cleanup_leftover_tmp()

    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def _cleanup_leftover_tmp(self) -> None:
        """Remove temp dirs from an interrupted prior run (the reference's
        leftover-temp cleanup, src/actions.rs:127-131). One level deep covers
        partitioned stages' per-chunk temp dirs."""
        for name in os.listdir(self.dir):
            p = os.path.join(self.dir, name)
            if name.endswith(".tmp"):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.isdir(p):
                for sub in os.listdir(p):
                    if sub.endswith(".tmp"):
                        shutil.rmtree(os.path.join(p, sub), ignore_errors=True)

    def _flush_manifest(self) -> None:
        tmp = self._manifest_path() + ".tmp.json"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())

    def stage(self, name: str, fn, inputs: tuple[str, ...] = ()) -> rd.Dataset:
        """Run ``fn() -> Dataset`` through the checkpoint, or resume it."""
        if self.dir is None:
            return fn()
        out_dir = os.path.join(self.dir, name)
        entry = self.manifest["stages"].get(name)
        if entry is not None and os.path.isdir(out_dir):
            return rd.read_parquet(out_dir)
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ds = fn()
        ds.write_parquet(tmp_dir)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.rename(tmp_dir, out_dir)
        done = rd.read_parquet(out_dir)
        self.manifest["stages"][name] = {
            "rows": done.count(),  # parquet metadata count — cheap
            "config_hash": self.config_hash,
            "inputs": list(inputs),
            "counters": snapshot_counters(),
        }
        self._flush_manifest()
        return done

    def partitioned_stage(
        self,
        name: str,
        chunks: list[list[str]],
        fn,
        inputs: tuple[str, ...] = (),
    ) -> rd.Dataset:
        """Per-PARTITION lineage (north_rule): ``fn(paths) -> Dataset`` runs
        once per chunk of input shards; every chunk is written and committed
        independently (atomic tmp+rename, its own manifest entry recording
        the exact input paths it derives from + row count + counters). A
        crash loses at most one in-flight chunk; resume recomputes only
        chunks absent from the manifest or whose recorded lineage no longer
        matches the input layout. Chunk membership must be a deterministic
        function of the input (sources/io.list_shards order)."""
        if self.dir is None:
            return fn([p for ch in chunks for p in ch])
        base = os.path.join(self.dir, name)
        os.makedirs(base, exist_ok=True)
        entry = self.manifest["stages"].get(name)
        if entry is None or "chunks" not in entry:
            # converting a flat stage() layout (or an unknown dir) to chunked:
            # stale flat part files next to chunkNNNNN/ dirs would be picked
            # up by consumers that read the whole directory (incremental's
            # rd.read_parquet/os.walk) — clear anything that isn't a chunk
            for leftover in os.listdir(base):
                if not leftover.startswith("chunk"):
                    p = os.path.join(base, leftover)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
            entry = {
                "partitioned": True,
                "chunks": {},
                "config_hash": self.config_hash,
                "inputs": list(inputs),
            }
            self.manifest["stages"][name] = entry
        done_dirs: list[str] = []
        for i, ch in enumerate(chunks):
            key = f"chunk{i:05d}"
            out_dir = os.path.join(base, key)
            ce = entry["chunks"].get(key)
            if ce is not None and ce.get("lineage") == list(ch) and os.path.isdir(out_dir):
                done_dirs.append(out_dir)
                continue
            tmp_dir = out_dir + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            fn(list(ch)).write_parquet(tmp_dir)
            shutil.rmtree(out_dir, ignore_errors=True)
            os.rename(tmp_dir, out_dir)
            entry["chunks"][key] = {
                "rows": rd.read_parquet(out_dir).count(),  # metadata count
                "lineage": list(ch),
                "counters": snapshot_counters(),
            }
            self._flush_manifest()
            done_dirs.append(out_dir)
        # stale chunks from a layout change shrink-wrap away
        for key in list(entry["chunks"]):
            if int(key.removeprefix("chunk")) >= len(chunks):
                del entry["chunks"][key]
                shutil.rmtree(os.path.join(base, key), ignore_errors=True)
                self._flush_manifest()
        # read_parquet expands a single directory but not directories inside
        # a list — list the part files explicitly
        files = [
            os.path.join(d, f)
            for d in done_dirs
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        return rd.read_parquet(files)

    def completed(self) -> list[str]:
        return list(self.manifest["stages"])
