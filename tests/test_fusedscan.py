"""Fused one-scan structured extraction (operators/fusedscan.py).

Pins the two contracts the webtext plan's w0 stage stands on:
(1) PARITY — the fused kernel composition emits exactly the same claim
multiset as unioning the per-channel DataFrame operators (they explode
the same kernels, so this pins the concat/composition itself), and the
fused text equals ``extract.extract_pages``'s byte-pinned text;
(2) ONE SCAN — the fused claims plan reads the pages source exactly
once (the union-of-operators form reads it once PER CHANNEL), with
zero shuffle and zero Python UDF on the claims path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.fusedscan import (
    fused_page_scan, fused_struct_claims,
)

# one page exercising EVERY channel, including edge shapes (blank-node
# subjects, multi-token props, ragged table, unheaded dl that drops)
MULTI_HTML = (
    '<script type="application/ld+json">'
    '{"@id":"prod:1","@type":"Product","name":"W5","tags":["a","b"],'
    '"maker":{"name":"ACME"}}</script>'
    '<script type="application/ld+json">not json</script>'
    '<meta property="og:title" content="Widget Five">'
    '<meta name="viewport" content="dropme">'
    '<div itemscope itemtype="https://schema.org/Product" itemid="prod:1">'
    '<span itemprop="name brand">W5</span></div>'
    '<div typeof="schema:Offer"><span property="price">42</span></div>'
    "<h2>List of Racks</h2><ul><li>r-1</li><li>r-2</li></ul>"
    "<ul><li>orphan-single</li></ul>"
    "<h2>srv-9</h2><dl><dt>dc</dt><dd>dc-3</dd><dt>ragged</dt></dl>"
    "<table><tr><th>host</th><th>os</th><th>dc</th></tr>"
    "<tr><td>srv-9</td><td>linux</td></tr>"
    "<tr><td>srv-10</td><td>bsd</td><td>dc-4</td></tr></table>"
)


def _pages(spark, html: str = MULTI_HTML):
    from datetime import datetime

    return spark.createDataFrame(
        [("u1", datetime(2026, 1, 1), bytearray(html, "utf-8"))],
        "url string, warc_ts timestamp, html binary",
    )


def _union_reference(pages):
    """The union-of-operators composition the kernel must match."""
    from sigraph_spark.operators.htmltables import table_triples
    from sigraph_spark.plans.webtext import _structured_claims

    tab = table_triples(pages).select(
        F.col("subj").alias("subject"), "predicate",
        F.col("obj").alias("object"), F.lit("table").alias("source"),
    )
    return _structured_claims(pages).unionByName(tab)


def _multiset(rows):
    return sorted(
        (r["subject"], r["predicate"], r["object"], r["source"]) for r in rows
    )


def test_parity_on_multichannel_page(spark):
    pages = _pages(spark)
    got = _multiset(fused_struct_claims(pages).collect())
    want = _multiset(_union_reference(pages).collect())
    assert got == want
    # every channel actually fired on this page
    assert {s for _, _, _, s in got} == {
        "jsonld", "meta", "microdata", "rdfa", "list", "dl", "table",
    }
    # spot semantics: list min_items gate dropped the singleton list,
    # viewport meta dropped, ragged dt without dd dropped
    assert ("orphan-single", "member_of", "racks", "list") not in got
    assert not any(p == "viewport" for _, p, _, _ in got)
    assert ("r-1", "member_of", "racks", "list") in got
    assert ("srv-9", "dc", "dc-3", "dl") in got
    assert ("srv-9", "os", "linux", "table") in got
    assert ("srv-10", "dc", "dc-4", "table") in got


def test_parity_on_combined_corpus(spark):
    from jobs.run_webtext_kg import synthetic_webtext_pages

    pages = synthetic_webtext_pages(spark, 0.0001).localCheckpoint(True)
    got = _multiset(fused_struct_claims(pages).collect())
    want = _multiset(_union_reference(pages).collect())
    assert got == want and len(got) > 0


def test_fused_text_matches_extract_pages(spark):
    from jobs.run_webtext_kg import synthetic_webtext_pages
    from sigraph_spark.operators.extract import extract_pages

    pages = synthetic_webtext_pages(spark, 0.0001).localCheckpoint(True)
    got = {
        r["url"]: r["text"]
        for r in fused_page_scan(pages).select("url", "text").collect()
    }
    want = {
        r["url"]: r["text"]
        for r in extract_pages(pages).select("url", "text").collect()
    }
    assert got == want


def test_one_scan_zero_shuffle_zero_udf(spark, tmp_path):
    src = str(tmp_path / "pages")
    _pages(spark).write.parquet(src)
    pages = spark.read.parquet(src)
    plan = (
        fused_struct_claims(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    # the union-of-operators reference form scans the source once PER
    # channel — the IO multiplier the fused kernel exists to remove
    ref_plan = (
        _union_reference(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert ref_plan.count("Scan parquet") >= 7


def test_full_scan_single_source_read_with_text(spark, tmp_path):
    src = str(tmp_path / "pages2")
    _pages(spark).write.parquet(src)
    pages = spark.read.parquet(src)
    plan = (
        fused_page_scan(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    # text extraction is the one sanctioned Python path: Arrow-batched
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
