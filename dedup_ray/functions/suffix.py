"""Suffix-structure substring matching (stage-3 verifier).

The north-star's third tier: long captions sharing a >= L-char substring are
near-duplicates even when shingle Jaccard is low (e.g. a long quote embedded
in otherwise different captions). Exact longest-common-substring via a suffix
automaton (O(n+m) states), which both the Ray verify stage and the
single-process oracle call — identical code path, so recall accounting is
apples-to-apples.
"""

from __future__ import annotations


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


def lcs_len(a: str, b: str) -> int:
    """Longest common substring length (build on the shorter side)."""
    if not a or not b:
        return 0
    if len(b) < len(a):
        a, b = b, a
    return SuffixAutomaton(a).longest_common_substring(b)
