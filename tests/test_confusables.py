"""Homoglyph skeletons (operators/confusables.py) — kernel behavior
per transformation layer, punycode, and the spoof-pair operator."""

from __future__ import annotations

from sigraph_spark.operators.confusables import (
    confusable_skeleton,
    spoof_pairs,
)


def test_cross_script_lookalikes_collide():
    # Cyrillic а/р in 'paypal', Greek omicron in 'google'
    assert confusable_skeleton("pаypаl.com") == \
        confusable_skeleton("paypal.com")
    assert confusable_skeleton("gοοgle.com") == \
        confusable_skeleton("google.com")


def test_digit_and_dash_lookalikes():
    assert confusable_skeleton("paypa1.com") == \
        confusable_skeleton("paypal.com")
    assert confusable_skeleton("examp1e–site.org") == \
        confusable_skeleton("example-site.org")


def test_nfkd_fullwidth_and_diacritics():
    assert confusable_skeleton("ｅｘａｍｐｌｅ.com") == \
        confusable_skeleton("example.com")
    assert confusable_skeleton("éxämple.com") == \
        confusable_skeleton("example.com")


def test_punycode_decodes_to_skeleton():
    # 'pаypаl.com' with Cyrillic а registered as punycode
    puny = "pаypаl".encode("idna").decode("ascii") + ".com"
    assert puny.startswith("xn--")
    assert confusable_skeleton(puny) == confusable_skeleton("paypal.com")


def test_case_fold_and_none():
    assert confusable_skeleton("ExAmple.COM") == \
        confusable_skeleton("example.com")
    assert confusable_skeleton(None) is None
    # legit distinct names do NOT collide
    assert confusable_skeleton("example.com") != \
        confusable_skeleton("exampple.com")


def test_spoof_pairs_operator(spark):
    rows = [("paypal.com",), ("pаypаl.com",), ("paypa1.com",),
            ("google.com",), ("gοοgle.com",), ("unrelated.org",)]
    df = spark.createDataFrame(rows, "name string")
    got = {(r["a"], r["b"]) for r in spoof_pairs(df).collect()}
    assert got == {
        ("paypa1.com", "paypal.com"),
        ("paypa1.com", "pаypаl.com"),
        ("paypal.com", "pаypаl.com"),
        ("google.com", "gοοgle.com"),
    }


def test_spoof_pairs_bucket_cap(spark):
    # a 4-way pile-up on skeleton 'aa.com' (Latin/Cyrillic a grid)
    pile = [("aa.com",), ("аa.com",), ("aа.com",), ("аа.com",)]
    small = [("google.com",), ("gοοgle.com",)]
    df = spark.createDataFrame(pile + small, "name string")
    got = {(r["a"], r["b"])
           for r in spoof_pairs(df, max_bucket=3).collect()}
    # the oversize bucket drops wholesale; the small one still emits
    assert got == {("google.com", "gοοgle.com")}
