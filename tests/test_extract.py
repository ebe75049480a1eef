"""S1 text extraction: boilerplate stripping + the byte-identity invariant
(BASELINE.json input_hint: byte-identical extracted text per url across
runs, partition counts, and parallelism levels)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.corpus import gen_pages
from sigraph_spark.operators.extract import extract_pages, strip_html, text_sha256


def test_strip_html_basic():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>.a{}</style></head><body>"
        b"<nav><a href='/'>Home</a></nav>"
        b"<h1>Title</h1><p>Hello &amp; goodbye.</p>"
        b"<footer>&copy; corp</footer></body></html>"
    )
    assert strip_html(html) == "Title\nHello & goodbye."


def test_strip_html_preserves_newlines_in_paragraph():
    html = b"<p>Line one.\nLine two.</p>"
    assert strip_html(html) == "Line one.\nLine two."


def test_strip_html_pure():
    html = b"<div>abc <b>def</b>\xff</div>"  # invalid utf-8 byte
    a = strip_html(html)
    b = strip_html(html)
    assert a == b  # deterministic under replace policy
    assert "def" in a


def test_extract_is_partition_invariant(spark):
    pages = gen_pages(spark, sf=0.001).limit(64).cache()
    h2 = (
        extract_pages(pages.repartition(2))
        .select("url", "text_sha256")
        .collect()
    )
    h8 = (
        extract_pages(pages.repartition(8))
        .select("url", "text_sha256")
        .collect()
    )
    assert sorted((r.url, r.text_sha256) for r in h2) == sorted(
        (r.url, r.text_sha256) for r in h8
    )
    pages.unpersist()


def test_extract_matches_python_reference(spark):
    pages = gen_pages(spark, sf=0.001).limit(16)
    rows = extract_pages(pages).select("url", "html", "text", "text_sha256").collect()
    for r in rows:
        expect = strip_html(bytes(r.html))
        assert r.text == expect
        assert r.text_sha256 == text_sha256(expect)


def test_no_row_udf_in_plan(spark):
    # hot-path constraint: the only Python in the plan is ArrowEvalPython
    pages = gen_pages(spark, sf=0.001)
    plan = extract_pages(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_strip_html_input_cap_and_nesting_bomb():
    """Crawl-grade bounds: a giant page truncates at MAX_HTML_BYTES
    deterministically, and a deep nested-dropped-container bomb terminates
    in bounded passes instead of looping per nesting level."""
    import time

    from sigraph_spark.operators.extract import (
        MAX_HTML_BYTES, strip_html,
    )

    # giant page: body beyond the cap is dropped, prefix text survives
    giant = (
        b"<html><body><p>head marker</p>" + b"x" * (MAX_HTML_BYTES + 1000)
    )
    out = strip_html(giant)
    assert "head marker" in out
    assert len(out) <= MAX_HTML_BYTES
    # pure + deterministic under the cap: same bytes -> same text
    assert strip_html(giant) == out

    # nesting bomb: 5k nested <script> layers — bounded passes, fast exit
    bomb = b"<p>before</p>" + b"<script>" * 5000 + b"payload" + b"</script>" * 5000
    t0 = time.monotonic()
    out2 = strip_html(bomb)
    assert time.monotonic() - t0 < 10
    assert "before" in out2


def test_strip_html_unclosed_script_never_leaks_code():
    """An unclosed <script>/<style> (malformed page, or the closer cut off
    by the byte cap) must drop to end-of-string — raw code can never enter
    the corpus as text. Structural containers (e.g. sloppy unclosed
    <head>) do NOT drop to EOS: browsers auto-close them."""
    from sigraph_spark.operators.extract import MAX_HTML_BYTES, strip_html

    out = strip_html(b"<p>keep me</p><script>var secret = 1;")
    assert "keep me" in out and "secret" not in out

    out2 = strip_html(b"<p>text</p><style>.x{color:red}")
    assert "text" in out2 and "color" not in out2

    # the truncation case: closer beyond the cap
    page = (
        b"<p>intro</p><script>" + b"j" * MAX_HTML_BYTES + b"</script><p>tail</p>"
    )
    out3 = strip_html(page)
    assert "intro" in out3 and "jjj" not in out3

    # sloppy-but-common unclosed <head> keeps the document body
    out4 = strip_html(b"<head><title>t</title><body><p>body text</p></body>")
    assert "body text" in out4
