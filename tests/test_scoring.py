"""End-to-end triple P/R vs the golden bank (BASELINE metric, small sf).

The extractor must reproduce the pinned triples exactly on the synthetic
corpus — P = R = 1.0 at any sf (the sf0.1 number reported in BENCH comes
from the same harness via tools/score_pr.py).
"""

from __future__ import annotations

from sigraph_spark.operators.scoring import score_corpus


def test_pr_perfect_on_synthetic_corpus(spark):
    s = score_corpus(spark, sf=0.001)
    assert s["precision"] >= 0.95, s
    assert s["recall"] >= 0.95, s
    # the goldens ARE the generator — anything below exact is a regression
    assert s["fp"] == 0 and s["fn"] == 0, s
