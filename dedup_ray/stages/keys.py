"""Stage A — exact-key computation (the cascade's cheap+verify keys).

Generalizes the reference's hash maps (/root/reference/src/hasher.rs:18-47:
partial-prefix BLAKE3 as the cheap key, full BLAKE3 as the verify key) to the
image+caption row:

    byte_len       ~ file size            (grouping key G1)
    content_hash   ~ full content hash    (exact tier, G4)
    pixel_hash     digest of DECODED pixels (re-encode-exact tier — new)
    caption_hash   digest of the caption   (exact-collapse key component)
    phash          perceptual hash         (given in the input per input_hint)

The stage DROPS ``bytes``: everything downstream shuffles only ids, digests
and captions — the reference's "content never enters the data model" rule
(src/hasher.rs:30-47 streams and discards), which at 100 TB keeps the wide
binary column out of every all-to-all exchange (SURVEY.md §7.3.6).

Stateless map_batches; decode is per-row Python+numpy (each call is C-heavy
zlib/numpy work), the rest vectorized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.functions import codecs
from dedup_ray.functions.hashing import pixel_hash


def compute_exact_keys(batch: pa.Table, dup_phashes: np.ndarray | None = None) -> pa.Table:
    """bytes/fmt -> digests; emits the signatures-base schema (no bytes).

    ``dup_phashes`` (sorted int64) enables CASCADE DECODE: rows whose phash
    is not in the set skip pixel decoding entirely and get a row-unique
    sentinel pixel_hash ("nd:" + content hash). Lossless for the duplicate
    relation: pixel-equal rows have equal phash, so both members of any
    pixel-dup pair are always in a >=2 phash group and get decoded; and two
    rows sharing a content hash share a phash too, so byte-dups are likewise
    always decoded. This is the reference's cascade property — work scales
    with the dup ratio, not the corpus (README.md:125-146 of the reference).
    """
    data = batch["bytes"]
    fmts = batch["fmt"].to_pylist()
    n = batch.num_rows
    content = np.empty(n, dtype=object)
    pixel = np.empty(n, dtype=object)
    decode_ok = np.ones(n, dtype=bool)
    ws = batch["w"].to_numpy(zero_copy_only=False)
    hs = batch["h"].to_numpy(zero_copy_only=False)
    if dup_phashes is not None and len(dup_phashes):
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dup_phashes, ph)
        pos[pos >= dup_phashes.size] = dup_phashes.size - 1
        need_decode = dup_phashes[pos] == ph
    elif dup_phashes is not None:
        need_decode = np.zeros(n, dtype=bool)
    else:
        need_decode = np.ones(n, dtype=bool)
    for i in range(n):
        raw = data[i].as_py()
        content[i] = hashlib.blake2b(raw, digest_size=32).hexdigest()
        if not need_decode[i]:
            # cascade skip: still validate CHEAPLY (header-only dims probe)
            # so drop semantics stay aligned with the always-decode path for
            # header-level corruption; deep payload corruption in a
            # phash-unique row is the documented residual difference
            dims = codecs.header_dims(raw, fmts[i])
            if dims is None or dims != (int(ws[i]), int(hs[i])):
                decode_ok[i] = False
                pixel[i] = ""
                continue
            pixel[i] = "nd:" + content[i]
            continue
        try:
            px = codecs.decode(raw, fmts[i])
            # schema-validation filter (F3 analog): declared dims must match
            # the decoded payload; mismatches are dropped+counted like the
            # reference's unreadable files (src/hasher.rs:56-60 filter_map)
            if px.shape != (int(hs[i]), int(ws[i]), 3):
                raise ValueError("shape mismatch")
            pixel[i] = pixel_hash(px).hex()
        except Exception:
            decode_ok[i] = False
            pixel[i] = ""
    captions = batch["caption"].to_pylist()
    caption_hash = [
        hashlib.blake2b(c.encode() if c else b"", digest_size=16).hexdigest()
        for c in captions
    ]
    if not decode_ok.all():
        from dedup_ray.state.metrics import inc_counter

        inc_counter("rows_dropped_unreadable", int((~decode_ok).sum()))
    byte_len = pc.binary_length(data).cast(pa.int64())
    out = pa.table(
        {
            "image_id": batch["image_id"],
            "byte_len": byte_len,
            "content_hash": pa.array(list(content), type=pa.string()),
            "pixel_hash": pa.array(list(pixel), type=pa.string()),
            "caption_hash": pa.array(caption_hash, type=pa.string()),
            "phash": batch["phash"],
            "fmt": batch["fmt"],
            "caption": batch["caption"],
        }
    )
    return out.filter(pa.array(decode_ok))


def _glob_regex(pat: str):
    """Compile one glob with the reference's literal-separator semantics
    (/root/reference/src/scanner.rs:13-28: globset literal_separator(true)):
    ``*``/``?`` never cross ``/``; ``**`` does; ``[...]`` classes pass through."""
    import re

    out = []
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            if pat[i : i + 3] == "**/":
                out.append("(?:.*/)?")  # globset: **/ matches zero or more dirs
                i += 3
            elif pat[i : i + 2] == "**":
                out.append(".*")
                i += 2
            else:
                out.append("[^/]*")
                i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            # glob classes negate with '!', regex with '^'; translate (and a
            # ']' first in the class is a literal member, as in fnmatch)
            k = i + 1
            if k < n and pat[k] == "!":
                k += 1
            if k < n and pat[k] == "]":
                k += 1
            j = pat.find("]", k)
            if j == -1:
                out.append(re.escape(c))
                i += 1
            else:
                inner = pat[i + 1 : j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                elif inner.startswith("^"):
                    inner = "\\^" + inner[1:]
                out.append("[" + inner + "]")
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return re.compile("".join(out) + r"\Z")


def glob_keep_mask(
    ids: list[str], include: list[str], exclude: list[str]
) -> list[bool]:
    """Reference include/exclude semantics on path-like ids
    (/root/reference/src/scanner.rs:31-41,59-84):

    * two-tier match: full id first, then basename (so ``*.log`` works on
      ``a/b/x.log`` even though ``*`` never crosses ``/``);
    * include applies to files only (full id | basename);
    * exclude also prunes SUBTREES: an id is excluded when any directory
      prefix (or its name) matches — the walk-time pruning analog;
    * exclude beats include.
    """
    inc = [_glob_regex(p) for p in include]
    exc = [_glob_regex(p) for p in exclude]

    def file_match(rs, ident: str, base: str) -> bool:
        return any(r.match(ident) or r.match(base) for r in rs)

    keep = []
    for ident in ids:
        parts = ident.split("/")
        base = parts[-1]
        ok = (not inc) or file_match(inc, ident, base)
        if ok and exc:
            if file_match(exc, ident, base):
                ok = False
            else:
                for k in range(1, len(parts)):
                    prefix = "/".join(parts[:k])
                    if any(r.match(prefix) or r.match(parts[k - 1]) for r in exc):
                        ok = False
                        break
        keep.append(ok)
    return keep


def exact_keys_stage(
    images: rd.Dataset,
    cfg: DedupConfig,
    phash_source: rd.Dataset | None = None,
    dup_phash_path: str | None = None,
    dup_ref=None,
) -> rd.Dataset:
    """images -> signatures-base table; applies the size predicate
    (reference --min-size/--max-size, src/scanner.rs:101-103) and the
    include/exclude id globs (src/scanner.rs:13-41) as vectorized batch
    filters before the digest work."""
    ds = images
    if cfg.min_size > 0 or cfg.max_size < 2**63 - 1:
        lo, hi = cfg.min_size, cfg.max_size

        def size_filter(b: pa.Table) -> pa.Table:
            ln = pc.binary_length(b["bytes"]).cast(pa.int64())
            keep = pc.and_(pc.greater_equal(ln, lo), pc.less_equal(ln, hi))
            return b.filter(keep)

        ds = ds.map_batches(size_filter, batch_format="pyarrow")
    if cfg.include or cfg.exclude:
        inc = [p for p in cfg.include]
        exc = [p for p in cfg.exclude]

        def glob_filter(b: pa.Table) -> pa.Table:
            return b.filter(
                pa.array(glob_keep_mask(b["image_id"].to_pylist(), inc, exc))
            )

        ds = ds.map_batches(glob_filter, batch_format="pyarrow")

    # dup_ref: a caller-precomputed dup-phash ObjectRef (the partitioned
    # checkpoint path hoists the pre-pass so it runs ONCE, not once per chunk)
    if cfg.cascade_decode and dup_ref is None:
        import ray

        # cheap pre-pass: count phash occurrences. Preferred path: ONE async
        # ray.remote task reading ONLY the phash column via pyarrow.dataset
        # (a few MB even at 100k rows) — the driver never blocks and the task
        # overlaps the main read's ramp-up; workers block on the ref only for
        # their first batch. Fallback (non-path inputs): per-block partial
        # counts + driver merge over ``phash_source``/``images``. NEVER a
        # groupby shuffle, and never select_columns-after-read (no projection
        # pushdown in Ray 2.49 — measured 17 s vs 1 s at 100k rows / 4.3 GB).
        # At cluster scale this broadcast becomes a semi-join on phash.
        if dup_phash_path is not None:
            dup_ref = _dup_phashes_task.remote(dup_phash_path)
        else:
            src = (
                phash_source
                if phash_source is not None
                else images.select_columns(["phash"])
            )

            def partial_counts(b: pa.Table) -> pa.Table:
                u, c = np.unique(
                    b["phash"].to_numpy(zero_copy_only=False), return_counts=True
                )
                return pa.table({"phash": pa.array(u, type=pa.int64()),
                                 "n": pa.array(c, type=pa.int64())})

            parts = [
                t for t in ray.get(
                    src.map_batches(partial_counts, batch_format="pyarrow")
                    .to_arrow_refs()
                )
                if t.num_rows and "phash" in t.column_names
            ]
            if parts:
                from dedup_ray.stages.grouped import merge_partial_counts

                merged = pa.concat_tables(parts)
                u, tot = merge_partial_counts(
                    merged["phash"].to_numpy(zero_copy_only=False),
                    merged["n"].to_numpy(zero_copy_only=False),
                )
                dup = u[tot >= 2]  # np.unique output is already sorted
            else:
                dup = np.empty(0, dtype=np.int64)
            from dedup_ray.state.metrics import inc_counter

            inc_counter("cascade_dup_phashes", int(dup.size))
            dup_ref = ray.put(dup)

    def keys_fn(b: pa.Table) -> pa.Table:
        dp = None if dup_ref is None else _resolve_dup_ref(dup_ref)
        return compute_exact_keys(b, dp)

    return ds.map_batches(keys_fn, batch_format="pyarrow")


_DUP_CACHE: dict[bytes, np.ndarray] = {}


def _resolve_dup_ref(ref) -> np.ndarray:
    """ray.get the dup-phash array once per worker process."""
    import ray

    key = ref.binary()
    got = _DUP_CACHE.get(key)
    if got is None:
        got = ray.get(ref)
        _DUP_CACHE.clear()
        _DUP_CACHE[key] = got
    return got


def _dup_phashes_impl(path: str) -> np.ndarray:
    import pyarrow.dataset as pads

    t = pads.dataset(path, format="parquet").to_table(columns=["phash"])
    ph = t["phash"].to_numpy(zero_copy_only=False)
    u, c = np.unique(ph, return_counts=True)
    return np.ascontiguousarray(u[c >= 2])


def _dup_union_phashes_impl(paths: list[str]) -> np.ndarray:
    """Dup phashes over the UNION of several tables (incremental pipeline:
    prior ∪ delta — a delta row colliding with a prior-unique phash makes
    BOTH cascade-decode)."""
    import pyarrow.dataset as pads

    parts = [
        pads.dataset(p, format="parquet")
        .to_table(columns=["phash"])["phash"]
        .to_numpy(zero_copy_only=False)
        for p in paths
    ]
    u, c = np.unique(np.concatenate(parts), return_counts=True)
    return np.ascontiguousarray(u[c >= 2])


def _col_uniques_impl(path: str, col: str) -> np.ndarray:
    """Sorted unique values of one column (tiny async column read)."""
    import pyarrow.dataset as pads

    t = pads.dataset(path, format="parquet").to_table(columns=[col])
    vals = t[col].to_numpy(zero_copy_only=False)
    return np.unique(vals)


def _rekey_scan_file_impl(path: str, delta_phashes: np.ndarray) -> np.ndarray:
    """Incremental pre-pass, one prior-keys checkpoint file: ids of cascade
    SENTINEL rows whose phash collides with the delta (these must re-decode).
    Runs as one remote task per file so the whole scan overlaps the delta
    decode — no driver barrier until the ids are actually needed."""
    import pyarrow.dataset as pads

    t = pads.dataset(path, format="parquet").to_table(
        columns=["image_id", "phash", "pixel_hash"]
    )
    ph = t["phash"].to_numpy(zero_copy_only=False)
    dp = np.sort(delta_phashes)
    if dp.size == 0 or len(ph) == 0:
        return np.empty(0, dtype=object)
    pos = np.searchsorted(dp, ph)
    pos[pos >= dp.size] = dp.size - 1
    hit = dp[pos] == ph
    sent = pa.compute.starts_with(t["pixel_hash"], "nd:").to_numpy(
        zero_copy_only=False
    )
    ids = t["image_id"].filter(pa.array(hit & sent)).to_pylist()
    return np.asarray(ids, dtype=object)


import ray as _ray

_dup_phashes_task = _ray.remote(num_cpus=1)(_dup_phashes_impl)
_dup_union_phashes_task = _ray.remote(num_cpus=1)(_dup_union_phashes_impl)
_col_uniques_task = _ray.remote(num_cpus=1)(_col_uniques_impl)
_rekey_scan_file_task = _ray.remote(num_cpus=1)(_rekey_scan_file_impl)
