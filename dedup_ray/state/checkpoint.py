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
  byte-identical final clusters).
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
        leftover-temp cleanup, src/actions.rs:127-131)."""
        for name in os.listdir(self.dir):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)

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

    def completed(self) -> list[str]:
        return list(self.manifest["stages"])
