"""Kneser-Ney bigram LM train/score (CCNet-style perplexity filter)."""

from __future__ import annotations

import math

from sigraph_spark.operators.corpus import (
    bigram_lm_logprob,
    bigram_lm_score,
    bigram_lm_train,
)

D = 0.75


def _py_model(train_texts):
    """Pure-python reference: identical count/smoothing definitions."""
    c12: dict[tuple[str, str], int] = {}
    for t in train_texts:
        ws = [w for w in t.lower().strip().split() if w]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    n_follow: dict[str, int] = {}
    n_prec: dict[str, int] = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n_follow[a] = n_follow.get(a, 0) + 1
        n_prec[b] = n_prec.get(b, 0) + 1
    return c12, c1, n_follow, n_prec, len(c12), len(n_prec)


def _py_score(text, model):
    c12, c1, n_follow, n_prec, t_types, v_cont = model
    ws = [w for w in text.lower().strip().split() if w]
    lps = []
    for a, b in zip(ws, ws[1:]):
        pc = (n_prec.get(b, 0) + 1.0) / (t_types + v_cont + 1.0)
        if a in c1:
            p = max(c12.get((a, b), 0) - D, 0.0) / c1[a] + D * n_follow[a] / c1[a] * pc
        else:
            p = pc
        lps.append(math.log(p))
    return (len(lps), round(sum(lps) / len(lps), 6)) if lps else None


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat saw the dog",
]
SCORE = [
    (0, "the cat sat on the mat"),          # in-distribution
    (1, "the cat flew over zanzibar"),      # unseen continuations
    (2, "zz qq xx"),                        # fully OOV histories + words
    (3, "dog"),                             # single token -> no row
    (4, ""),                                # empty -> no row
    (5, "  the   CAT  sat "),               # case/whitespace normalization
]


def _dfs(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    return train, score


def test_matches_python_reference(spark):
    train, score = _dfs(spark)
    out = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in bigram_lm_logprob(score, train).collect()
    }
    model = _py_model(TRAIN)
    expect = {i: _py_score(t, model) for i, t in SCORE}
    expect = {k: v for k, v in expect.items() if v is not None}
    assert set(out) == set(expect)
    for k in expect:
        assert out[k][0] == expect[k][0]
        assert abs(out[k][1] - expect[k][1]) < 1e-6, (k, out[k], expect[k])


def test_probabilities_positive_and_ordering(spark):
    """In-distribution text must outscore OOV gibberish; all log-probs
    finite (the implicit-UNK mass keeps every probability > 0)."""
    train, score = _dfs(spark)
    out = {r["doc_id"]: r["mean_logprob"] for r in bigram_lm_logprob(score, train).collect()}
    assert all(math.isfinite(v) for v in out.values())
    assert out[0] > out[1] > out[2]


def test_model_tables_shapes(spark):
    train, _ = _dfs(spark)
    m = bigram_lm_train(train)
    c12, c1, n_follow, n_prec, t_types, v_cont = _py_model(TRAIN)
    sc = m["scalars"].collect()[0]
    assert sc["t_types"] == t_types and sc["v_cont"] == v_cont
    got12 = {(r["w1"], r["w2"]): r["c12"] for r in m["bigrams"].collect()}
    assert got12 == c12
    hist = {r["w1"]: (r["c1"], r["n_follow"]) for r in m["history"].collect()}
    assert hist == {w: (c1[w], n_follow[w]) for w in c1}
    cont = {r["w2"]: r["n_prec"] for r in m["continuation"].collect()}
    assert cont == n_prec


def test_partition_invariance(spark):
    train, score = _dfs(spark)
    a = sorted(bigram_lm_logprob(score, train).collect())
    b = sorted(
        bigram_lm_score(score.repartition(5), bigram_lm_train(train.repartition(3)))
        .collect()
    )
    assert a == b
