"""Suffix-structure substring matching (stage-3 verifier).

The north-star's third tier: long captions sharing a >= L-char substring are
near-duplicates even when shingle Jaccard is low (e.g. a long quote embedded
in otherwise different captions). Exact longest-common-substring via a suffix
automaton (O(n+m) states), which both the Ray verify stage and the
single-process oracle call — identical code path, so recall accounting is
apples-to-apples.
"""

from __future__ import annotations

import numpy as np


class SuffixAutomaton:
    """Suffix automaton over one string; supports streaming LCS queries.

    Built once per left-hand caption, queried against many right-hand
    captions — in the pipeline it lives inside a verify actor and is cached
    keyed by src_id (SURVEY.md §7.2 "pair verify / suffix-array actor pool").
    """

    __slots__ = ("next", "link", "length")

    def __init__(self, s: str) -> None:
        self.next: list[dict[str, int]] = [{}]
        self.link: list[int] = [-1]
        self.length: list[int] = [0]
        last = 0
        for ch in s:
            cur = len(self.next)
            self.next.append({})
            self.link.append(0)
            self.length.append(self.length[last] + 1)
            p = last
            while p >= 0 and ch not in self.next[p]:
                self.next[p][ch] = cur
                p = self.link[p]
            if p >= 0:
                q = self.next[p][ch]
                if self.length[p] + 1 == self.length[q]:
                    self.link[cur] = q
                else:
                    clone = len(self.next)
                    self.next.append(dict(self.next[q]))
                    self.link.append(self.link[q])
                    self.length.append(self.length[p] + 1)
                    while p >= 0 and self.next[p].get(ch) == q:
                        self.next[p][ch] = clone
                        p = self.link[p]
                    self.link[q] = clone
                    self.link[cur] = clone
            last = cur

    def longest_common_substring(self, t: str) -> int:
        """Length of the longest substring of ``t`` present in the base string."""
        v, cur_len, best = 0, 0, 0
        for ch in t:
            while v and ch not in self.next[v]:
                v = self.link[v]
                cur_len = self.length[v]
            if ch in self.next[v]:
                v = self.next[v][ch]
                cur_len += 1
                if cur_len > best:
                    best = cur_len
            else:
                v, cur_len = 0, 0
        return best


_HB = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_HBINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


class _HashLCS:
    """Per-pair rolling-hash context: prefix sums S = cumsum(c[j] * B^-j)
    and power tables are L-independent, built once; each ``common(L)`` probe
    is then three vectorized passes — H(i,L) = (S[i+L]-S[i]) * B^(i+L-1) is
    canonical per substring, so window-set intersection decides "do a and b
    share an L-char substring" in O(n+m)."""

    __slots__ = ("n", "sa", "sb", "pw")

    def __init__(self, a: str, b: str) -> None:  # len(a) <= len(b)
        n, m = len(a), len(b)
        self.n = n
        ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        pw = np.empty(m, dtype=np.uint64)
        inv_pw = np.empty(m, dtype=np.uint64)
        pw[0] = inv_pw[0] = np.uint64(1)
        if m > 1:
            np.cumprod(np.full(m - 1, _HB, dtype=np.uint64), out=pw[1:])
            np.cumprod(np.full(m - 1, _HBINV, dtype=np.uint64), out=inv_pw[1:])
        self.pw = pw
        self.sa = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(ca * inv_pw[:n], out=self.sa[1:])
        self.sb = np.zeros(m + 1, dtype=np.uint64)
        np.cumsum(cb * inv_pw, out=self.sb[1:])

    def common(self, L: int) -> bool:
        if L > self.n:
            return False
        ha = np.sort((self.sa[L:] - self.sa[:-L]) * self.pw[L - 1 : self.n])
        hb = (self.sb[L:] - self.sb[:-L]) * self.pw[L - 1 :]
        pos = np.searchsorted(ha, hb)
        pos[pos >= ha.size] = ha.size - 1
        return bool((ha[pos] == hb).any())

    def search_up(self, lo: int) -> int:
        """Max L with a common L-window, given common(lo) is known True."""
        hi = lo * 2
        while hi <= self.n and self.common(hi):
            lo, hi = hi, hi * 2
        hi = min(hi - 1, self.n)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self.common(mid):
                lo = mid
            else:
                hi = mid - 1
        return lo


def lcs_len(a: str, b: str, min_len: int = 1) -> int:
    """Longest common substring length.

    Exponential + binary search on the answer over vectorized rolling-hash
    window sets (O((n+m) log n) numpy work) — replaces a pure-Python
    suffix-automaton build that was 82% of verify-stage CPU. Window equality
    is by 64-bit polynomial hash (collision odds ~(n*m)/2^64 per pair); the
    single-process oracle calls THIS function, so the pipeline/oracle
    relation stays bit-identical by construction. ``SuffixAutomaton`` above
    remains the exact reference implementation (property-tested equal).

    ``min_len``: threshold short-circuit — when the caller only cares
    whether LCS >= min_len (tier-3 verify), a single probe at min_len
    rejects below-threshold pairs; the exact length is then resolved only
    for passers. Returns 0 when LCS < min_len."""
    if not a or not b:
        return 0
    if len(b) < len(a):
        a, b = b, a
    ctx = _HashLCS(a, b)
    if not ctx.common(min_len):
        return 0
    return ctx.search_up(min_len)


def lcs_len_many(
    pairs: list[tuple[int, str, str]], min_len: int = 1
) -> list[tuple[int, int]]:
    """Batched ``lcs_len``: (key, a, b) -> (key, lcs), with the same
    ``min_len`` short-circuit (0 when below threshold)."""
    return [(k, lcs_len(a, b, min_len)) for k, a, b in pairs]


def longest_repeated_substring(s: str, min_len: int = 1) -> int:
    """Length of the longest substring occurring >= 2 times within ``s``
    (0 if none of at least ``min_len``). Binary search over the answer
    length with a vectorized polynomial rolling hash per step — feasibility
    of length L is monotone, so O(n log n) total. Hash-equal position
    groups are verified by direct substring comparison, so collisions can
    never inflate the answer."""
    n = len(s)
    if n < 2 or min_len > n - 1:
        return 0
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    B = np.uint64(1099511628211)
    # prefix hashes H[i] = hash of s[:i] (natural uint64 wraparound)
    H = np.zeros(n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound IS the hash
        for i in range(n):  # O(n) scalar pass; no cumulative mul-add kernel
            H[i + 1] = H[i] * B + c[i]

    def feasible(L: int) -> bool:
        pw = np.uint64(pow(1099511628211, L, 1 << 64))
        with np.errstate(over="ignore"):  # mod-2^64 wraparound IS the hash
            g = H[L:] - H[:-L] * pw  # hash of every L-gram
        order = np.argsort(g, kind="stable")
        gs = g[order]
        dup = np.flatnonzero(gs[1:] == gs[:-1])
        for d in dup:  # verify hash-equal neighbors exactly
            i, j = int(order[d]), int(order[d + 1])
            if s[i:i + L] == s[j:j + L]:
                return True
        return False

    lo, hi, best = min_len, n - 1, 0
    while lo <= hi:
        mid = (lo + hi) // 2
        if feasible(mid):
            best, lo = mid, mid + 1
        else:
            hi = mid - 1
    return best
