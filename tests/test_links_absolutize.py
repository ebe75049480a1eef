"""URL absolutization (links.absolutize_url) — RFC 3986 §5 resolution
cases incl. dot-segment stack behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from sigraph_spark.operators.links import absolutize_url

BASE = "https://Example.com/a/b/page.html?q=1#top"

CASES = [
    ("https://other.org/x", "https://other.org/x"),           # absolute
    ("mailto:x@y.z", "mailto:x@y.z"),                         # scheme
    ("//cdn.net/lib.js", "https://cdn.net/lib.js"),           # proto-rel
    ("/root.png", "https://Example.com/root.png"),            # root-rel
    ("?page=2", "https://Example.com/a/b/page.html?page=2"),  # query
    ("#sec", "https://Example.com/a/b/page.html?q=1#sec"),    # fragment
    ("img.png", "https://Example.com/a/b/img.png"),           # relative
    ("./img.png", "https://Example.com/a/b/img.png"),         # dot
    ("../up.png", "https://Example.com/a/up.png"),            # dotdot
    ("../../../clamp.png", "https://Example.com/clamp.png"),  # clamp
    ("c/d.png?x=1#f", "https://Example.com/a/b/c/d.png?x=1#f"),
]


def test_resolution_cases(spark):
    df = spark.createDataFrame(
        [(BASE, ref, exp) for ref, exp in CASES],
        "base string, ref string, exp string")
    got = df.select(
        absolutize_url(F.col("base"), F.col("ref")).alias("abs"),
        "ref", "exp").collect()
    for r in got:
        assert r["abs"] == r["exp"], (r["ref"], r["abs"], r["exp"])


def test_rootless_base(spark):
    df = spark.createDataFrame(
        [("https://h.io", "x.png")], "base string, ref string")
    got = df.select(absolutize_url(F.col("base"), F.col("ref"))).collect()
    assert got[0][0] == "https://h.io/x.png"
