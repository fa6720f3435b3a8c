"""Exact Levenshtein edit distance with a cap (banded early exit).

The reference's verify tier is exact byte equality (full BLAKE3,
/root/reference/src/hasher.rs:30-47); the edit-distance tier generalizes
that final stage to bounded character edits. Candidate generation reuses
the MinHash-LSH bands, so only candidate pairs ever pay the DP — the same
cascade-then-verify shape (SURVEY.md §0, M5's per-pair verify slot).
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Exact edit distance between two strings (unicode code points,
    matching DuckDB ``levenshtein()``'s character semantics).

    If ``cap`` is given and the true distance exceeds it, returns cap+1
    as soon as that is provable (length gap, or every DP cell in a row
    above cap) — the verify tier only needs exact values for kept pairs.

    The inner column recurrence cur[j] = min(m[j], cur[j-1]+1) is a
    min-plus prefix scan, computed as one ``np.minimum.accumulate`` over
    (value − index) — no Python loop over the shorter string's columns.
    """
    if a == b:
        return 0
    xa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    xb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    # trim the common prefix and suffix — distance-preserving (every
    # optimal alignment maps equal flanks to each other), and near-dup
    # pairs share most of their content, so the DP runs only on the
    # differing middle
    m = min(len(xa), len(xb))
    if m:
        neq = xa[:m] != xb[:m]
        p = int(np.argmax(neq)) if neq.any() else m
        xa, xb = xa[p:], xb[p:]
        m = min(len(xa), len(xb))
    if m:
        neq = xa[len(xa) - m:] != xb[len(xb) - m:]
        t = int(np.argmax(neq[::-1])) if neq.any() else m
        if t:
            xa, xb = xa[: len(xa) - t], xb[: len(xb) - t]
    if len(xb) > len(xa):  # iterate over the longer string's rows; the
        xa, xb = xb, xa  # vectorized axis is the shorter one
    if len(xb) == 0:
        d = len(xa)
        return d if cap is None or d <= cap else cap + 1
    if cap is not None and len(xa) - len(xb) > cap:
        return cap + 1
    ar = np.arange(len(xb) + 1, dtype=np.int64)
    prev = ar.copy()
    for i in range(1, len(xa) + 1):
        sub = prev[:-1] + (xb != xa[i - 1])
        m = np.minimum(prev[1:] + 1, sub)
        vals = np.concatenate(([i], m)) - ar
        cur = np.minimum.accumulate(vals) + ar
        if cap is not None and cur.min() > cap:
            return cap + 1
        prev = cur
    return int(prev[-1])
