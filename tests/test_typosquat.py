"""Typosquat deletion-key blocking (operators/typosquat.py) — key-set
completeness for each edit kind, the operator contract, and parity
with the quadratic formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.typosquat import deletion_keys, typo_pairs


def _pairs(spark, names, **kw):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return {(r["a"], r["b"], r["dist"])
            for r in typo_pairs(df, **kw).collect()}


def test_deletion_keys_column(spark):
    df = spark.createDataFrame([("abc",)], "name string")
    ks = df.select(deletion_keys(F.col("name")).alias("k")).collect()[0]["k"]
    assert set(ks) == {"abc", "bc", "ac", "ab"}


def test_each_edit_kind_found(spark):
    got = _pairs(spark, ["google.com", "gogle.com",     # deletion
                         "ggoogle.com",                 # insertion
                         "goggle.com",                  # substitution
                         "unrelated.org"])
    assert got == {
        ("gogle.com", "google.com", 1),
        ("ggoogle.com", "google.com", 1),
        ("goggle.com", "google.com", 1),
        ("goggle.com", "gogle.com", 1),
    }


def test_matches_quadratic_formulation(spark):
    import itertools

    names = [f"name{i}x" for i in range(30)]
    names += ["nam3{}x".format(i) for i in range(0, 30, 3)]  # subs
    names += ["name" + str(i) for i in range(0, 30, 5)]      # deletions
    names = sorted(set(names))
    got = _pairs(spark, names)

    def lev1(a, b):
        # distance exactly 1 for same/adjacent lengths (brute check)
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        s, t = (a, b) if la < lb else (b, a)
        for i in range(len(t)):
            if t[:i] + t[i + 1:] == s:
                return True
        return False

    exp = {(a, b, 1) for a, b in itertools.combinations(names, 2)
           if lev1(a, b)}
    assert got == exp and len(exp) > 0


def test_combosquat_pairs(spark):
    from sigraph_spark.operators.typosquat import combosquat_pairs

    domains = spark.createDataFrame(
        [("paypal-login.com",), ("secure-PayPal.net",), ("paypal.com",),
         ("nopaypallike.org",), ("innocent.com",), ("paypal.co.uk",)],
        "domain string")
    brands = spark.createDataFrame([("paypal",)], "brand string")
    got = {(r["domain"], r["brand"])
           for r in combosquat_pairs(domains, brands).collect()}
    # paypal.com's label IS the brand -> excluded; paypal.co.uk's
    # label 'paypal.co' CONTAINS it -> flagged (multi-label TLDs are
    # the caller's suffix-list problem); case-insensitive
    assert got == {("paypal-login.com", "paypal"),
                   ("secure-PayPal.net", "paypal"),
                   ("nopaypallike.org", "paypal"),
                   ("paypal.co.uk", "paypal")}


def test_min_len_floor(spark):
    got = _pairs(spark, ["ab", "ac", "abcd", "abce"], min_len=4)
    assert got == {("abcd", "abce", 1)}  # short names excluded
