"""Deterministic synthetic image+caption corpus with planted ground truth.

Generalizes the reference's benchmark corpus generator
(/root/reference/benchmark/generator.py:49-125 — seed 42, content = f(seed),
dup-ratio coin flip, metadata.json ground truth) to the input_hint table
``(image_id, bytes, w, h, fmt, caption, phash)`` with the near-dup cluster
classes from FIXTURES.md §1.

Two-phase design so generation itself scales like the engine:
  1. ``plan_corpus``   — driver-side: a LIGHT plan table (one small row per
     output row: class, cluster seed, member index, fmt). At real scale this
     plan would itself be sharded; at test scale it is a few MB.
  2. ``materialize``   — heavy work (pixel synthesis, codec encode, phash) as
     a vectorized ``map_batches`` stage over the plan, or locally for unit
     tests. Every byte is a pure function of (seed, cluster_seed, member_idx)
     — the reference's "content = f(seed)" trick — so distributed retries are
     deterministic.

Sidecars: ``gt_clusters.parquet`` (image_id, gt_cluster_id, dup_class) and
``metadata.json`` (count-level oracle, analog of generator.py:106-121).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dedup_ray.functions import codecs
from dedup_ray.functions.hashing import phash64

SCALES = {"tiny": 200, "small": 5000, "bench": 50_000}

# class -> (weight, cluster_size_range) ; hot classes get explicit sizes
_CLASS_MIX = [
    ("unique", 0.42, (1, 1)),
    ("exact_byte", 0.12, (2, 4)),
    ("reencode", 0.10, (2, 3)),
    ("phash_near", 0.10, (2, 3)),
    ("caption_near", 0.10, (2, 4)),
    ("caption_substring", 0.06, (2, 2)),
    ("hot_empty_caption", 0.08, (1, 1)),  # singletons w/ caption="" (degenerate key)
    ("hot_identical", 0.02, None),        # one giant exact cluster (skew case)
]

# opt-in mix (spec.rot_dups): adds rotated/flipped duplicate clusters —
# members are exact dihedral transforms of member 0's pixels in a LOSSLESS
# fmt (raw/png), so the planted ground truth is exactly recoverable by the
# orbit-canonical digest. Weight comes out of `unique`; default corpora are
# byte-identical to the legacy mix.
_CLASS_MIX_ROT = [
    ("unique", 0.34, (1, 1)),
    ("rotated", 0.08, (2, 4)),
] + _CLASS_MIX[1:]

# opt-in mix (spec.pad_dups): adds letterboxed/framed duplicate clusters —
# members are member 0's pixels wrapped in a uniform-color border, in a
# LOSSLESS fmt, so the planted ground truth is exactly recoverable by the
# canonical border-strip digest (pipelines/neardup.letterbox_crop). Weight
# comes out of `unique`, like _CLASS_MIX_ROT.
_CLASS_MIX_PAD = [
    ("unique", 0.34, (1, 1)),
    ("padded", 0.08, (2, 4)),
] + _CLASS_MIX[1:]

_FMTS = ["raw", "png", "qnt"]
_FMT_W = [0.4, 0.4, 0.2]

_SYLLABLES = [
    "ka", "ro", "mi", "ta", "lu", "ve", "so", "na", "pel", "dor",
    "sha", "ri", "ben", "qua", "zo", "fen", "gal", "hu", "wex", "yar",
]


def _vocab(rng: np.random.Generator, n: int = 600) -> list[str]:
    words = []
    for _ in range(n):
        k = int(rng.integers(2, 5))
        words.append("".join(_SYLLABLES[int(i)] for i in rng.integers(0, len(_SYLLABLES), k)))
    return words


@dataclass(frozen=True)
class CorpusSpec:
    n_rows: int
    seed: int = 42
    hot_cluster_size: int = 40
    img_min: int = 16
    img_max: int = 48
    caption_words: tuple[int, int] = (5, 30)
    substring_words: tuple[int, int] = (40, 70)
    dup_ratio: float | None = None  # target fraction of rows in dup groups
    # (None = legacy class-mix behaviour ~0.7; the reference benchmarks at
    # 0.10/0.30/0.60 — benchmark/config.py:20-22)
    rot_dups: bool = False  # opt-in: plant rotated/flipped duplicate clusters
    pad_dups: bool = False  # opt-in: plant letterboxed/framed duplicate clusters

    @property
    def vocab_size(self) -> int:
        # vocabulary grows with the corpus: a fixed tiny vocab makes random
        # captions unrealistically shingle-similar at scale (candidate junk
        # grew superlinearly at 100k rows with 600 words)
        return max(600, self.n_rows // 10)


# ------------------------------------------------------------------ plan


def plan_corpus(spec: CorpusSpec) -> pa.Table:
    """Light plan table: one row per output row.

    columns: row_uid:int64 (pre-shuffle position), cluster_seed:int64,
    member_idx:int32, dup_class:string, fmt:string
    """
    rng = np.random.default_rng(spec.seed)
    mix = (_CLASS_MIX_ROT if spec.rot_dups
           else _CLASS_MIX_PAD if spec.pad_dups else _CLASS_MIX)
    names = [c[0] for c in mix]
    weights = np.array([c[1] for c in mix])
    weights = weights / weights.sum()
    sizes = {c[0]: c[2] for c in mix}

    dup_names = [n for n in names if n not in ("unique", "hot_empty_caption")]
    dup_w = np.array([w for n, w, _ in mix if n in dup_names])
    dup_w = dup_w / dup_w.sum()
    uniq_names = ["unique", "hot_empty_caption"]
    uniq_w = np.array([0.84, 0.16])

    rows: list[tuple[int, int, str, str]] = []  # (cluster_seed, member_idx, class, fmt)
    hot_done = False
    dup_rows = 0
    while len(rows) < spec.n_rows:
        if spec.dup_ratio is None:
            cls = names[int(rng.choice(len(names), p=weights))]
        elif dup_rows < spec.dup_ratio * max(1, len(rows)):
            cls = dup_names[int(rng.choice(len(dup_names), p=dup_w))]
        else:
            cls = uniq_names[int(rng.choice(2, p=uniq_w))]
        if cls == "hot_identical":
            if hot_done:
                cls = "unique"
            else:
                hot_done = True
        cluster_seed = int(rng.integers(0, 2**62))
        if cls == "hot_identical":
            n = spec.hot_cluster_size
        else:
            lo, hi = sizes[cls]
            n = int(rng.integers(lo, hi + 1))
        if cls in dup_names:
            dup_rows += n
        for m in range(n):
            if cls == "exact_byte" or cls == "hot_identical":
                fmt = _FMTS[int(rng.choice(3, p=_FMT_W))] if m == 0 else None
                # same bytes => same fmt; member 0's draw reused at materialize
                fmt = fmt or "same_as_0"
            elif cls == "reencode":
                # force distinct fmts across members (the class's point)
                fmt = ["raw", "png", "qnt"][m % 3]
            elif cls in ("rotated", "padded"):
                # lossless only: members must decode to EXACT transforms
                fmt = ["raw", "png"][int(rng.integers(0, 2))]
            else:
                fmt = _FMTS[int(rng.choice(3, p=_FMT_W))]
            rows.append((cluster_seed, m, cls, fmt))

    rows = rows[: spec.n_rows]
    # fix up exact-byte groups truncated mid-cluster: fine, semantics unchanged.
    # shuffle row order so clusters aren't adjacent in the table
    order = rng.permutation(len(rows))
    rows = [rows[i] for i in order]
    # resolve "same_as_0": needs the member-0 fmt per cluster_seed
    fmt0 = {r[0]: r[3] for r in rows if r[1] == 0 and r[3] != "same_as_0"}
    resolved = []
    for cs, m, cls, fmt in rows:
        if fmt == "same_as_0":
            fmt = fmt0.get(cs, "raw")
        resolved.append((cs, m, cls, fmt))
    return pa.table(
        {
            "row_uid": pa.array(range(len(resolved)), type=pa.int64()),
            "cluster_seed": pa.array([r[0] for r in resolved], type=pa.int64()),
            "member_idx": pa.array([r[1] for r in resolved], type=pa.int32()),
            "dup_class": pa.array([r[2] for r in resolved], type=pa.string()),
            "fmt": pa.array([r[3] for r in resolved], type=pa.string()),
        }
    )


# ------------------------------------------------------------ materialize


def _base_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Smooth blocky image: 8x8 random palette kron-upscaled + mild noise —
    gives phash strong structure so near-dup perturbations stay near."""
    base = rng.integers(0, 256, (8, 8, 3), dtype=np.int32)
    up = np.kron(base, np.ones(((h + 7) // 8, (w + 7) // 8, 1), dtype=np.int32))[:h, :w]
    noise = rng.integers(-6, 7, up.shape, dtype=np.int32)
    return np.clip(up + noise, 0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator, vocab: list[str], lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n))


def _edit_caption(rng: np.random.Generator, vocab: list[str], caption: str, rate: float) -> str:
    words = caption.split()
    out = []
    for wd in words:
        r = rng.random()
        if r < rate * 0.5:
            continue  # delete
        if r < rate:
            out.append(vocab[int(rng.integers(0, len(vocab)))])  # substitute
        else:
            out.append(wd)
    return " ".join(out) if out else caption


def materialize_rows(batch: pa.Table, spec: CorpusSpec) -> pa.Table:
    """Plan rows -> corpus rows. Pure function of (spec.seed, cluster_seed,
    member_idx) so it is retry-deterministic when run distributed."""
    vocab_rng = np.random.default_rng(spec.seed + 1)
    vocab = _vocab(vocab_rng, spec.vocab_size)

    out = {k: [] for k in ("row_uid", "bytes", "w", "h", "fmt", "caption", "phash", "dup_class")}
    cs_arr = batch["cluster_seed"].to_numpy(zero_copy_only=False)
    mi_arr = batch["member_idx"].to_numpy(zero_copy_only=False)
    cls_arr = batch["dup_class"].to_pylist()
    fmt_arr = batch["fmt"].to_pylist()
    uid_arr = batch["row_uid"].to_numpy(zero_copy_only=False)

    for uid, cs, m, cls, fmt in zip(uid_arr, cs_arr, mi_arr, cls_arr, fmt_arr):
        crng = np.random.default_rng((int(spec.seed) << 1) ^ int(cs))  # cluster-level
        w = int(crng.integers(spec.img_min, spec.img_max + 1))
        h = int(crng.integers(spec.img_min, spec.img_max + 1))
        pixels = _base_pixels(crng, w, h)
        lo, hi = spec.caption_words
        caption = _caption(crng, vocab, lo, hi)
        mrng = np.random.default_rng((int(cs) << 2) ^ (int(m) * 0x9E3779B9) ^ spec.seed)

        if cls in ("unique", "hot_empty_caption"):
            # fresh image per row (cluster size 1, but keep rows distinct)
            pixels = _base_pixels(mrng, w, h)
            caption = "" if cls == "hot_empty_caption" else _caption(mrng, vocab, lo, hi)
        elif cls in ("exact_byte", "hot_identical"):
            pass  # identical pixels + caption for every member
        elif cls == "reencode":
            pass  # identical pixels + caption; fmt differs per plan
        elif cls == "rotated":
            if m > 0:
                # exact dihedral transform #1..7 of member 0's pixels;
                # caption stays the cluster caption (a rotated copy keeps
                # its label). w/h columns are fixed up below from the
                # actual array shape (90/270 rotations swap them).
                from dedup_ray.functions.hashing import _dihedral_orbit

                k = 1 + (int(m) - 1) % 7
                for i, t in enumerate(_dihedral_orbit(pixels)):
                    if i == k:
                        pixels = np.ascontiguousarray(t)
                        break
        elif cls == "padded":
            if m > 0:
                # member 0's pixels wrapped in a uniform-color border of
                # per-member deterministic color/widths; caption stays the
                # cluster caption (a letterboxed copy keeps its label).
                # w/h columns are fixed up below from the actual shape.
                col = mrng.integers(0, 256, size=3, dtype=np.int64).astype(np.uint8)
                t, b_, l, r = (int(x) for x in mrng.integers(1, max(2, min(w, h) // 6), size=4))
                ph, pw2 = pixels.shape[0] + t + b_, pixels.shape[1] + l + r
                framed = np.empty((ph, pw2, 3), dtype=np.uint8)
                framed[:, :] = col
                framed[t : t + pixels.shape[0], l : l + pixels.shape[1]] = pixels
                pixels = framed
        elif cls == "phash_near":
            if m > 0:
                # perturb a small patch; caption fully different
                pw = max(1, w // 8)
                x0 = int(mrng.integers(0, w - pw + 1))
                y0 = int(mrng.integers(0, h - pw + 1))
                patch = pixels[y0 : y0 + pw, x0 : x0 + pw].astype(np.int32)
                pixels = pixels.copy()
                pixels[y0 : y0 + pw, x0 : x0 + pw] = np.clip(
                    patch + int(mrng.integers(20, 40)), 0, 255
                ).astype(np.uint8)
            caption = _caption(mrng, vocab, lo, hi)
        elif cls == "caption_near":
            pixels = _base_pixels(mrng, w, h)  # different image per member
            if m > 0:
                caption = _edit_caption(mrng, vocab, caption, rate=0.15)
        elif cls == "caption_substring":
            pixels = _base_pixels(mrng, w, h)
            slo, shi = spec.substring_words
            shared = _caption(crng, vocab, slo, shi)  # same for all members
            own = _caption(mrng, vocab, lo, hi)
            caption = own + " " + shared if m % 2 else shared + " " + own
        else:  # pragma: no cover
            raise ValueError(f"unknown class {cls}")

        data = codecs.encode(pixels, fmt)
        decoded = codecs.decode(data, fmt)  # phash over *decoded* pixels
        out["row_uid"].append(int(uid))
        out["bytes"].append(data)
        # declared dims come from the ACTUAL array (identical to the cluster
        # draw except for 90/270-rotated members, which swap w/h)
        out["w"].append(int(pixels.shape[1]))
        out["h"].append(int(pixels.shape[0]))
        out["fmt"].append(fmt)
        out["caption"].append(caption)
        out["phash"].append(phash64(decoded))
        out["dup_class"].append(cls)

    return pa.table(
        {
            "row_uid": pa.array(out["row_uid"], type=pa.int64()),
            "bytes": pa.array(out["bytes"], type=pa.binary()),
            "w": pa.array(out["w"], type=pa.int32()),
            "h": pa.array(out["h"], type=pa.int32()),
            "fmt": pa.array(out["fmt"], type=pa.string()),
            "caption": pa.array(out["caption"], type=pa.string()),
            "phash": pa.array(out["phash"], type=pa.int64()),
            "dup_class": pa.array(out["dup_class"], type=pa.string()),
        }
    )


# ------------------------------------------------------------------ write


def generate_corpus(
    out_dir: str,
    scale: str = "tiny",
    seed: int = 42,
    use_ray: bool = True,
    n_rows: int | None = None,
    img_min: int | None = None,
    img_max: int | None = None,
    dup_ratio: float | None = None,
    rot_dups: bool = False,
    pad_dups: bool = False,
) -> dict:
    """Generate the corpus + sidecars into ``out_dir``; returns metadata.

    Idempotent cache: if ``metadata.json`` exists with the same config hash,
    generation is skipped (the corpus is a pure function of its spec).
    ``img_min``/``img_max`` override the pixel-side range (bench corpora use
    realistic larger images so decode dominates like it would in production).
    """
    spec = CorpusSpec(
        n_rows=n_rows or SCALES[scale], seed=seed, dup_ratio=dup_ratio,
        rot_dups=rot_dups, pad_dups=pad_dups,
    )
    if img_min or img_max:
        from dataclasses import replace

        spec = replace(
            spec, img_min=img_min or spec.img_min, img_max=img_max or spec.img_max
        )
    cfg_hash = (
        f"{spec.n_rows}-{spec.seed}-{spec.hot_cluster_size}"
        f"-{spec.img_min}-{spec.img_max}-{spec.vocab_size}-{spec.dup_ratio}-v7"
        + ("-rot1" if spec.rot_dups else "")
        + ("-pad1" if spec.pad_dups else "")
    )
    meta_path = os.path.join(out_dir, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("config_hash") == cfg_hash:
            return meta

    os.makedirs(out_dir, exist_ok=True)
    plan = plan_corpus(spec)

    # image_id is FORMULAIC: img_{row_uid:09d} (row_uid is the shuffled table
    # position) — so ground truth derives from the plan alone and the heavy
    # corpus can be written in uid-ordered chunks (never one giant concat:
    # >2 GB of binary overflows 32-bit Arrow offsets).
    if use_ray:
        import ray
        import ray.data as rd

        ds = rd.from_arrow(plan)
        n_blocks = max(1, spec.n_rows // 2000)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
        mat = ds.map_batches(
            lambda b: materialize_rows(b, spec), batch_format="pyarrow", batch_size=1000
        )
        tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    else:
        tables = [materialize_rows(plan, spec)]

    def with_ids(chunk: pa.Table) -> pa.Table:
        uids = chunk["row_uid"].to_numpy(zero_copy_only=False)
        ids = pa.array([f"img_{u:09d}" for u in uids], type=pa.string())
        return pa.table(
            {
                "image_id": ids,
                "bytes": chunk["bytes"],
                "w": chunk["w"],
                "h": chunk["h"],
                "fmt": chunk["fmt"],
                "caption": chunk["caption"],
                "phash": chunk["phash"],
            }
        )

    # a DIRECTORY of part files: Ray parallelizes reads per file (a single
    # parquet file is one fragment = one serial read task), and per-shard
    # files are the resumable output layout the engine itself uses
    corpus_path = os.path.join(out_dir, "images.parquet")
    tmp_path = corpus_path + ".tmp"
    shutil.rmtree(tmp_path, ignore_errors=True)
    os.makedirs(tmp_path)
    # enough part files that the fused read->map stage can fill every core
    # (map task count == file count when the read fuses with the first map)
    chunk_rows = max(1024, min(10_000, spec.n_rows // 64))
    part = 0
    for lo in range(0, spec.n_rows, chunk_rows):
        hi = lo + chunk_rows
        parts = []
        for t in tables:
            uid = t["row_uid"]
            mask = pa.compute.and_(
                pa.compute.greater_equal(uid, lo), pa.compute.less(uid, hi)
            )
            p = t.filter(mask)
            if p.num_rows:
                parts.append(p)
        chunk = pa.concat_tables(parts)
        chunk = chunk.take(pa.compute.sort_indices(chunk["row_uid"]))
        chunk = with_ids(chunk)
        pq.write_table(
            chunk,
            os.path.join(tmp_path, f"part-{part:05d}.parquet"),
            row_group_size=1024,
            # image bytes are incompressible; skipping snappy reads ~40%
            # faster at identical file size (measured round 2)
            compression="none",
        )
        part += 1
    # a stale corpus may be a single FILE (pre-directory layout): rmtree
    # silently no-ops on files under ignore_errors and the rename would fail
    if os.path.isfile(corpus_path):
        os.remove(corpus_path)
    else:
        shutil.rmtree(corpus_path, ignore_errors=True)
    os.rename(tmp_path, corpus_path)

    # ground-truth cluster = min image_id among same cluster_seed for dup rows
    plan_sorted = plan.take(pa.compute.sort_indices(plan["row_uid"]))
    cseeds = plan_sorted["cluster_seed"].to_numpy(zero_copy_only=False)
    classes = plan_sorted["dup_class"].to_pylist()
    id_list = [f"img_{i:09d}" for i in range(plan.num_rows)]
    by_seed: dict[int, list[int]] = {}
    for i, (cs, cls) in enumerate(zip(cseeds, classes)):
        if cls not in ("unique", "hot_empty_caption"):
            by_seed.setdefault(int(cs), []).append(i)
    gt_cluster = list(id_list)  # default: own id
    for members in by_seed.values():
        rep = min(id_list[i] for i in members)
        for i in members:
            gt_cluster[i] = rep

    gt = pa.table(
        {
            "image_id": pa.array(id_list, type=pa.string()),
            "gt_cluster_id": pa.array(gt_cluster, type=pa.string()),
            "dup_class": pa.array(classes, type=pa.string()),
        }
    )
    _atomic_write_parquet(gt, os.path.join(out_dir, "gt_clusters.parquet"))

    n_dup_rows = sum(len(m) for m in by_seed.values() if len(m) >= 2)
    meta = {
        "total_rows": plan.num_rows,
        "unique_rows": plan.num_rows - n_dup_rows,
        "rows_in_dup_groups": n_dup_rows,
        "dup_groups": sum(1 for m in by_seed.values() if len(m) >= 2),
        "seed": spec.seed,
        "scale": scale,
        "config_hash": cfg_hash,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, meta_path)
    return meta


def _atomic_write_parquet(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    # small row groups: Ray parallelizes reads per row group — one giant row
    # group makes every downstream map stage a single task
    pq.write_table(table, tmp, row_group_size=1024, compression="none")
    os.replace(tmp, path)
