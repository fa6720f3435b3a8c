"""dup_ratio targeting in the corpus planner (reference matrix knob,
benchmark/config.py:20-22)."""

import pyarrow.compute as pc

from dedup_ray.sources.corpus import CorpusSpec, plan_corpus


def _dup_fraction(spec):
    plan = plan_corpus(spec)
    dup = pc.sum(
        pc.cast(
            pc.invert(
                pc.is_in(
                    plan["dup_class"],
                    value_set=__import__("pyarrow").array(
                        ["unique", "hot_empty_caption"]
                    ),
                )
            ),
            "int64",
        )
    ).as_py()
    return dup / plan.num_rows


def test_dup_ratio_targets():
    for target in (0.1, 0.3, 0.6):
        got = _dup_fraction(CorpusSpec(n_rows=4000, dup_ratio=target))
        assert abs(got - target) < 0.06, (target, got)


def test_legacy_mix_unchanged():
    # None keeps the original class-mix behaviour (deterministic)
    a = plan_corpus(CorpusSpec(n_rows=500))
    b = plan_corpus(CorpusSpec(n_rows=500))
    assert a.equals(b)
