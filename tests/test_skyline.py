"""_skyline_mask vs an O(n^2) brute-force dominance check, plus the
lossless-local-reduction property pareto_parts relies on (skyline of a
union == skyline of the concatenated per-block skylines)."""

import numpy as np

from dedup_ray.pipelines.relational import _skyline_mask


def _brute(price: np.ndarray, size: np.ndarray) -> set[int]:
    keep = set()
    for i in range(len(price)):
        dominated = any(
            price[j] <= price[i] and size[j] >= size[i]
            and (price[j] < price[i] or size[j] > size[i])
            for j in range(len(price))
        )
        if not dominated:
            keep.add(i)
    return keep


def _sorted(price, size):
    order = np.lexsort((-size, price))
    return price[order], size[order]


def test_skyline_matches_brute_force_with_ties():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        # small domains force duplicate prices, sizes, and exact ties
        price = rng.integers(0, 8, n).astype(np.float64)
        size = rng.integers(0, 8, n).astype(np.int64)
        p, s = _sorted(price, size)
        got = {(p[i], s[i]) for i in np.flatnonzero(_skyline_mask(p, s))}
        want = {(p[i], s[i]) for i in _brute(p, s)}
        assert got == want
        # multiplicity: duplicate non-dominated points must ALL be kept
        kept = _skyline_mask(p, s)
        for i in np.flatnonzero(kept):
            same = (p == p[i]) & (s == s[i])
            assert kept[same].all()


def test_local_skyline_reduction_is_lossless():
    rng = np.random.default_rng(11)
    price = rng.integers(0, 50, 200).astype(np.float64)
    size = rng.integers(0, 50, 200).astype(np.int64)
    p, s = _sorted(price, size)
    direct = _skyline_mask(p, s)
    want = sorted(zip(p[direct], s[direct]))
    # split into 4 "blocks", reduce each locally, merge, reduce again
    frags_p, frags_s = [], []
    for chunk in np.array_split(np.arange(200), 4):
        cp, cs = _sorted(price[chunk], size[chunk])
        m = _skyline_mask(cp, cs)
        frags_p.append(cp[m])
        frags_s.append(cs[m])
    mp, ms = _sorted(np.concatenate(frags_p), np.concatenate(frags_s))
    mm = _skyline_mask(mp, ms)
    assert sorted(zip(mp[mm], ms[mm])) == want


def test_skyline_empty_and_single():
    assert _skyline_mask(np.empty(0), np.empty(0, np.int64)).size == 0
    assert _skyline_mask(np.array([1.0]), np.array([5])).tolist() == [True]
