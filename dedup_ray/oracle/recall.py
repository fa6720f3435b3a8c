"""Pair-level recall/precision between two cluster assignments.

The BASELINE.md target: dup-pair recall >= 0.99 of the pipeline's clusters
vs the oracle's, at matched config (upgrading the reference harness's
count-equality accuracy check, /root/reference/benchmark/runner.py:60-66,
to pair level)."""

from __future__ import annotations

from itertools import combinations


def cluster_pairs(assignment: dict[str, str]) -> set[tuple[str, str]]:
    """All unordered within-cluster pairs of a node->cluster_id mapping."""
    groups: dict[str, list[str]] = {}
    for node, cid in assignment.items():
        groups.setdefault(cid, []).append(node)
    pairs: set[tuple[str, str]] = set()
    for members in groups.values():
        if len(members) > 1:
            for a, b in combinations(sorted(members), 2):
                pairs.add((a, b))
    return pairs


def pair_recall_precision(
    predicted: dict[str, str], truth: dict[str, str]
) -> dict[str, float]:
    p = cluster_pairs(predicted)
    t = cluster_pairs(truth)
    tp = len(p & t)
    return {
        "recall": tp / len(t) if t else 1.0,
        "precision": tp / len(p) if p else 1.0,
        "predicted_pairs": len(p),
        "truth_pairs": len(t),
        "true_positives": tp,
    }
