"""Mergeable quantile sketch for UNBOUNDED value domains.

The engine's exact quantile operators (numeric_profile,
lang_length_quantiles, trim_length_outliers, length_cume_dist) all ride a
(value, count) histogram whose size is bounded by the column DOMAIN — the
right call for integer lengths, wrong for continuous doubles where every
value is distinct. This is the documented swap-in (SCALE.md): a
deterministic KLL/MRL-style compactor sketch — per-batch sketches merge
associatively, memory is O(k · log(n/k)) regardless of n, and rank error
is O(log²(n/k) / k) · n.

Determinism: compaction keeps the even-index half of the sorted buffer (no
random offset — reproducible across runs/processes at the cost of a small
one-sided bias that the rank-error tests bound). An odd element is retained
at its level, so no item is ever dropped without weight transfer.
"""

from __future__ import annotations

import numpy as np


class QuantileSketch:
    """Levels of value buffers; items at level i carry weight 2^i."""

    def __init__(self, k: int = 256) -> None:
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]

    def add(self, vals: np.ndarray) -> "QuantileSketch":
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            self.levels[0] = np.concatenate([self.levels[0], v])
            self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, np.float64))
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if buf.size > self.k:
                s = np.sort(buf, kind="stable")
                m = s.size - (s.size % 2)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                # even indices of the sorted even-length prefix promote with
                # doubled weight; the odd leftover stays at this level
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], s[:m:2]]
                )
                self.levels[i] = s[m:]
            i += 1

    @property
    def n(self) -> int:
        """Total weighted count represented."""
        return int(sum(lv.size << i for i, lv in enumerate(self.levels)))

    def quantiles(self, qs: list[float]) -> list[float]:
        """Weighted-rank quantile estimates (value at rank ceil(q*n),
        1-based — quantile_disc semantics over the weighted items)."""
        vals = np.concatenate(self.levels)
        if vals.size == 0:
            return [float("nan")] * len(qs)
        wts = np.concatenate(
            [np.full(lv.size, 1 << i, np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = int(cum[-1])
        out = []
        for q in qs:
            r = max(1, int(np.ceil(q * total)))
            out.append(float(vals[np.searchsorted(cum, r)]))
        return out

    # ------------------------------------------------ row (de)serialization

    def to_rows(self) -> list[tuple[int, list[float]]]:
        return [
            (i, lv.tolist()) for i, lv in enumerate(self.levels) if lv.size
        ]

    @classmethod
    def from_rows(
        cls, rows: list[tuple[int, list[float]]], k: int = 256
    ) -> "QuantileSketch":
        sk = cls(k)
        for lvl, vals in rows:
            while len(sk.levels) <= lvl:
                sk.levels.append(np.empty(0, np.float64))
            sk.levels[lvl] = np.concatenate(
                [sk.levels[lvl], np.asarray(vals, np.float64)]
            )
        sk._compact()
        return sk
