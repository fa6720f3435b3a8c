"""Table IO seam: Lance when available, Parquet otherwise.

The north-star input is a Lance table; this sandbox has no ``lance`` wheel,
so a single seam hides the difference — schema and downstream code are
identical (SURVEY.md §7.0). Column projection is always passed through to the
reader (prune at the read: never ship ``bytes`` into a stage that only needs
keys/captions).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

try:  # pragma: no cover - lance not present in this environment
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


class _SchemaHashNoise(__import__("logging").Filter):
    """Drop Ray's "Failed to hash the schemas (for deduplication)" line.

    It fires whenever a read's blocks still carry pandas schema metadata
    (whose dict makes pyarrow Schema.__hash__ raise) — benign: Ray just
    skips a dedup fast path and unifies the schemas anyway. Reads WITHOUT
    a predicate avoid it structurally via _add_meta_free_schema; predicate
    reads cannot pass an explicit schema (see _add_meta_free_schema), so
    the cosmetic line is filtered here instead. The worker-side logger is
    configured per-process, hence the filter installs at import time (the
    module imports inside every Ray task that reads)."""

    def filter(self, record) -> bool:  # pragma: no cover - trivial
        return "Failed to hash the schemas" not in record.getMessage()


__import__("logging").getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoise())


def read_table(
    path: str | list[str],
    columns: list[str] | None = None,
    predicate=None,
    **kwargs,
) -> rd.Dataset:
    """Read a corpus table (``.lance`` dataset dir or ``.parquet`` file/dir,
    or an explicit list of part files — the per-partition checkpoint path).

    ~ the reference's scan stage (/root/reference/src/scanner.rs:44-111):
    fragments/row-groups give read parallelism; ``columns`` is projection
    pushdown (the analog of never stat-ing files you won't hash), and
    ``predicate`` (a ``pyarrow.dataset`` expression) is predicate pushdown —
    row groups whose statistics exclude the predicate are never read, the
    analog of the reference's exclude-during-walk subtree pruning
    (/root/reference/src/scanner.rs:59-84). Formats without scan-level
    filtering (JSONL/CSV) fall back to a vectorized post-read filter with
    identical semantics.
    """
    if isinstance(path, list):
        if predicate is not None:
            kwargs["filter"] = predicate
        else:
            _add_meta_free_schema(path[0] if path else None, columns, kwargs)
        return rd.read_parquet(path, columns=columns, **kwargs)
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "data"))):
        ds = rd.read_lance(path, columns=columns, **kwargs)  # pragma: no cover
        if predicate is not None:  # pragma: no cover
            ds = ds.map_batches(
                lambda b: b.filter(predicate), batch_format="pyarrow"
            )
        return ds  # pragma: no cover
    # text-table ingestion formats (documents-style corpora arrive as JSONL
    # or CSV at least as often as parquet): projection applied right after
    # the read — these readers have no columns= pushdown, so prune eagerly
    if path.endswith((".jsonl", ".json", ".csv")):
        ds = rd.read_json(path, **kwargs) if not path.endswith(".csv") else rd.read_csv(path, **kwargs)
        if predicate is not None:
            ds = ds.map_batches(lambda b: b.filter(predicate), batch_format="pyarrow")
        return ds.select_columns(columns) if columns else ds
    if predicate is not None:
        kwargs["filter"] = predicate
    else:
        _add_meta_free_schema(path, columns, kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def _add_meta_free_schema(path, columns, kwargs) -> None:
    """Set an explicit metadata-free ``schema=`` for a parquet read (unless
    the caller passed one): pandas-written files carry a `pandas` schema-
    metadata blob whose dict makes pyarrow Schema.__hash__ raise inside
    Ray's block concat ("Failed to hash the schemas" spam + a defeated
    schema-dedup cache). Skipped under a predicate: Ray coerces each
    projected batch with the SAME schema it hands the fragment scanner,
    so any explicit schema either breaks a filter on an unprojected
    column (narrowed) or the coercion itself (full) — those reads instead
    rely on the module-level log filter + read_view's post-read strip."""
    if path is None or "schema" in kwargs:
        return
    import pyarrow.parquet as pq

    try:
        f = list_shards(path)[0] if isinstance(path, str) else path
        schema = pq.read_schema(f).remove_metadata()
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        kwargs["schema"] = schema
    except Exception:
        pass  # unreadable footer / missing column: let the reader decide


def list_shards(path: str) -> list[str]:
    """Deterministically-ordered physical shards of a table: the part files
    of a parquet directory (one Lance fragment each at the north star), or
    the single file itself. The unit of per-partition checkpoint lineage —
    chunk membership must be a pure function of the input layout."""
    if os.path.isdir(path) and not (HAVE_LANCE and path.endswith(".lance")):
        names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
        if names:
            return [os.path.join(path, n) for n in names]
    return [path]


def _strip_meta(b):
    # pandas-written parquet carries a `pandas` schema-metadata blob whose
    # presence makes pyarrow Schema.__hash__ raise (unhashable dict) inside
    # Ray's block concat -> "Failed to hash the schemas" warning spam and a
    # defeated schema-dedup cache. Dropping metadata is zero-copy.
    return b.replace_schema_metadata(None)


def read_view(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """read_table with the schema metadata stripped AT the read (an explicit
    metadata-free ``schema=`` keeps even intra-read fragment concat clean).

    Use for externally-written tables (the driver's testdata is written by
    pandas)."""
    # no explicit schema under a predicate (Ray's batch coercion would
    # reject it — see _add_meta_free_schema): those reads fall back to the
    # post-read strip + the module-level log filter
    if not HAVE_LANCE and "schema" not in kwargs and kwargs.get("predicate") is None:
        import pyarrow.parquet as pq

        f = list_shards(path)[0]
        try:
            schema = pq.read_schema(f).remove_metadata()
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            kwargs["schema"] = schema
        except Exception:
            pass  # fall back to a post-read strip
    ds = read_table(path, columns=columns, **kwargs)
    if "schema" in kwargs:
        return ds
    return ds.map_batches(
        _strip_meta, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    """Directory-of-part-files sink (resumable layout: a rerun of a stage
    rewrites its whole directory atomically via the checkpoint layer)."""
    ds.write_parquet(path, **kwargs)
