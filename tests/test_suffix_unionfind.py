"""Suffix automaton LCS + union-find unit tests."""

from dedup_ray.functions.suffix import SuffixAutomaton, lcs_len
from dedup_ray.functions.unionfind import UnionFind, connected_components


def test_lcs_basic():
    assert lcs_len("abcdef", "zzcdezz") == 3
    assert lcs_len("same", "same") == 4
    assert lcs_len("abc", "xyz") == 0
    assert lcs_len("", "abc") == 0
    assert lcs_len("abc", "") == 0


def test_lcs_symmetric():
    a, b = "the rain in spain falls mainly", "no rain in spain today"
    assert lcs_len(a, b) == lcs_len(b, a) == len(" rain in spain ")


def test_suffix_automaton_queries():
    sa = SuffixAutomaton("abracadabra")
    assert sa.longest_common_substring("cadabr") == 6
    assert sa.longest_common_substring("xyz") == 0
    assert sa.longest_common_substring("abracadabra") == 11


def test_unionfind_components_min_rep():
    uf = UnionFind()
    uf.union("c", "b")
    uf.union("b", "a")
    uf.union("x", "y")
    comp = uf.components()
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_connected_components_chain_vs_star():
    chain = connected_components([("a", "b"), ("b", "c"), ("c", "d")])
    star = connected_components([("a", "b"), ("a", "c"), ("a", "d")])
    assert chain == star


def test_unionfind_idempotent():
    uf = UnionFind()
    uf.union("a", "b")
    uf.union("a", "b")
    uf.union("b", "a")
    assert uf.components() == {"a": "a", "b": "a"}
