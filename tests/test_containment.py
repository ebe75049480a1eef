"""Asymmetric shingle-containment near-dup detection."""

from __future__ import annotations

from sigraph_spark.operators.dedup import containment_pairs

BASE = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = [
    (1, BASE),
    (2, BASE + " iota kappa lambda mu nu xi omicron pi rho sigma tau"),  # superset of 1
    (3, "completely different words entirely unrelated text here now"),
    (4, BASE),                       # exact dup of 1
    (5, "alpha beta gamma"),         # short doc -> single whole-text shingle? no: 3 words = 1 shingle
]


def _shingles(text, k=3):
    ws = [w for w in text.lower().strip().split() if w]
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _py_pairs(docs, min_c=0.5, k=3):
    sh = {i: _shingles(t, k) for i, t in docs}
    out = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            cab = round(inter / len(sh[a]), 6)
            cba = round(inter / len(sh[b]), 6)
            if max(cab, cba) >= min_c:
                out[(a, b)] = (inter, cab, cba)
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_reference(spark):
    got = {
        (r["a"], r["b"]): (r["n_common"], r["containment_ab"], r["containment_ba"])
        for r in containment_pairs(_df(spark)).collect()
    }
    assert got == _py_pairs(DOCS)


def test_asymmetry_detects_subset_doc(spark):
    got = {
        (r["a"], r["b"]): (r["containment_ab"], r["containment_ba"])
        for r in containment_pairs(_df(spark)).collect()
    }
    # doc 1 fully contained in doc 2; reverse direction well below 1
    cab, cba = got[(1, 2)]
    assert cab == 1.0 and cba < 0.5
    # exact duplicates: both directions 1.0
    assert got[(1, 4)] == (1.0, 1.0)


def test_threshold_filters(spark):
    all_pairs = {
        (r["a"], r["b"]) for r in containment_pairs(_df(spark), min_containment=0.0).collect()
    }
    high = {
        (r["a"], r["b"]) for r in containment_pairs(_df(spark), min_containment=0.99).collect()
    }
    assert high <= all_pairs
    assert (1, 2) in high and (3, 4) not in all_pairs  # 3 shares nothing


def test_stop_shingle_prune_lowers_counts(spark):
    # every shingle of doc 1 occurs in docs 1, 2, 4 (df >= 3): pruning at
    # df <= 2 removes those from pair generation entirely
    pruned = {
        (r["a"], r["b"]): r["n_common"]
        for r in containment_pairs(
            _df(spark), min_containment=0.0, max_shingle_df=2
        ).collect()
    }
    assert (1, 2) not in pruned and (1, 4) not in pruned
    exact = {
        (r["a"], r["b"]): r["n_common"]
        for r in containment_pairs(_df(spark), min_containment=0.0).collect()
    }
    for k_, v in pruned.items():
        assert v <= exact[k_]


def test_partition_invariance(spark):
    df = _df(spark)
    a = sorted(containment_pairs(df).collect())
    b = sorted(containment_pairs(df.repartition(5)).collect())
    assert a == b
