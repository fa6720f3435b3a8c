"""Levenshtein kernel: exactness vs a reference DP, cap semantics, and
DuckDB levenshtein() parity on random strings."""

import duckdb
import numpy as np
import pytest

from dedup_ray.functions.editdist import levenshtein


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("kitten", "sitting", 3),
        ("", "", 0),
        ("", "abc", 3),
        ("abc", "", 3),
        ("same", "same", 0),
        ("flaw", "lawn", 2),
    ],
)
def test_known_values(a, b, d):
    assert levenshtein(a, b) == d


def test_matches_reference_dp_random():
    rng = np.random.default_rng(7)
    alpha = "abcde"
    for _ in range(60):
        la, lb = rng.integers(0, 25, size=2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        assert levenshtein(a, b) == _ref_lev(a, b)


def test_matches_duckdb():
    con = duckdb.connect()
    rng = np.random.default_rng(11)
    alpha = "abxyz "
    for _ in range(20):
        la, lb = rng.integers(1, 40, size=2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        (exp,) = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()
        assert levenshtein(a, b) == exp


def test_cap_exact_below_and_cut_above():
    a, b = "abcdefghij", "abcdefghix"  # distance 1
    assert levenshtein(a, b, cap=1) == 1
    # distance 10 vs cap 3 -> any value > 3
    assert levenshtein("aaaaaaaaaa", "bbbbbbbbbb", cap=3) > 3
    # length-gap fast path
    assert levenshtein("a", "a" * 50, cap=5) > 5


def test_symmetry_after_swap():
    # the kernel swaps to iterate the longer string's rows
    assert levenshtein("short", "a much longer string") == levenshtein(
        "a much longer string", "short"
    )
