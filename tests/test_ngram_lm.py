"""N-gram LM quality scoring (operators/ngram_lm.py) — counts, stupid
backoff selection, and log-score arithmetic vs hand computation."""

from __future__ import annotations

import math

from sigraph_spark.operators.ngram_lm import score_docs, train_ngram_lm

TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts(spark):
    m = train_ngram_lm(_docs(spark, TRAIN))
    assert m["total"] == 9
    c = {(r["order"], r["context"], r["word"]): r["cnt"]
         for r in m["counts"].collect()}
    assert c[(1, "", "the")] == 3
    assert c[(2, "the", "cat")] == 2
    assert c[(3, "the cat", "sat")] == 1
    assert (3, "cat ran", "x") not in c  # contexts stop at doc end


def test_backoff_selection_and_score(spark):
    m = train_ngram_lm(_docs(spark, TRAIN))
    # score a doc whose tokens exercise every backoff order:
    #   'the'  pos0 -> unigram 3/9 * a^2
    #   'cat'  pos1 -> bigram (the cat)=2 / uni(the)=3 * a
    #   'sat'  pos2 -> trigram (the cat sat)=1 / bi(the cat)=2
    #   'zzz'  pos3 -> OOV floor a^2/9
    out = score_docs(_docs(spark, [(9, "the cat sat zzz")]), m).collect()
    r = out[0]
    assert (r["n_tokens"], r["n_tri"], r["n_bi"], r["n_uni"],
            r["n_oov"]) == (4, 1, 1, 1, 1)
    a = 2.0 / 5.0
    exp = (math.log(a * a * (3.0 / 9.0)) + math.log(a * (2.0 / 3.0))
           + math.log(1.0 / 2.0) + math.log(a * a / 9.0))
    assert abs(r["logprob"] - round(exp, 4)) < 2e-4


def test_fluent_beats_garbled(spark):
    m = train_ngram_lm(_docs(spark, TRAIN))
    scored = {r["doc_id"]: r["logprob"] for r in score_docs(
        _docs(spark, [(1, "the cat sat on the mat"),
                      (2, "mat the on sat cat the")]), m).collect()}
    # per-token average: same tokens, but the fluent order hits
    # trigrams while the garbled one backs off — higher logprob
    assert scored[1] > scored[2]
