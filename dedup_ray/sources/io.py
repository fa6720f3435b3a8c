"""Table IO seam: Lance when available, Parquet otherwise.

The north-star input is a Lance table; this sandbox has no ``lance`` wheel,
so a single seam hides the difference — schema and downstream code are
identical (SURVEY.md §7.0). Column projection is always passed through to the
reader (prune at the read: never ship ``bytes`` into a stage that only needs
keys/captions).
"""

from __future__ import annotations

import os

import ray.data as rd

try:  # pragma: no cover - lance not present in this environment
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read a corpus table (``.lance`` dataset dir or ``.parquet`` file/dir).

    ~ the reference's scan stage (/root/reference/src/scanner.rs:44-111):
    fragments/row-groups give read parallelism; ``columns`` is projection
    pushdown (the analog of never stat-ing files you won't hash).
    """
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "data"))):
        return rd.read_lance(path, columns=columns, **kwargs)  # pragma: no cover
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    """Directory-of-part-files sink (resumable layout: a rerun of a stage
    rewrites its whole directory atomically via the checkpoint layer)."""
    ds.write_parquet(path, **kwargs)
