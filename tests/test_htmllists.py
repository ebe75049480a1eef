"""HTML list extraction (operators/htmllists.py).

Pins the flat document-order model the ``list_items`` gate relies on:
heading-context fold (lists before the first heading keep ''), list_idx
numbering incl. empty lists, item boundary = closing </li>, tag-strip /
empty-item drop, nested-list truncation, and the membership derivation
(lowercase + "list of" strip, min_items cut, cross-page vote counts)
plus the zero-UDF / zero-shuffle extraction plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.htmllists import list_items, list_memberships


def _pages(spark, html: str, url: str = "u1"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def _rows(spark, html: str):
    return {
        (r["list_idx"], r["item_idx"], r["heading"], r["item"])
        for r in list_items(_pages(spark, html)).collect()
    }


def test_full_page_semantics(spark):
    html = (
        "<ul><li>orphan1</li><li>orphan2</li></ul>"  # before any heading
        "<h2>Operating <b>Systems</b></h2>"
        "<p>prose</p>"
        "<ul><li>linux</li><li><a href='/bsd'>freebsd</a></li>"
        "<li></li>"  # empty item: drops, consumes item_idx 2
        "<li>netbsd"  # unclosed: drops entirely
        "</ul>"
        "<ul></ul>"  # empty list: consumes list_idx 2, emits nothing
        "<h3>List of Data Centers</h3>"
        "<ol><li>dc-1</li><li>dc-2</li></ol>"
    )
    assert _rows(spark, html) == {
        (0, 0, "", "orphan1"),
        (0, 1, "", "orphan2"),
        (1, 0, "Operating Systems", "linux"),
        (1, 1, "Operating Systems", "freebsd"),
        (3, 0, "List of Data Centers", "dc-1"),
        (3, 1, "List of Data Centers", "dc-2"),
    }


def test_heading_context_updates_between_lists(spark):
    html = (
        "<h1>A</h1><ul><li>x</li></ul>"
        "<h4>B</h4><ul><li>y</li></ul>"
    )
    assert _rows(spark, html) == {(0, 0, "A", "x"), (1, 0, "B", "y")}


def test_empty_heading_still_updates_context(spark):
    html = "<h2>A</h2><h3></h3><ul><li>x</li></ul>"
    assert _rows(spark, html) == {(0, 0, "", "x")}


def test_nested_list_truncates_at_first_close(spark):
    # inner </ul> closes the block: only the items before it survive
    html = "<h2>A</h2><ul><li>a</li><ul><li>b</li></ul><li>c</li></ul>"
    got = _rows(spark, html)
    assert (0, 0, "A", "a") in got
    assert all(item != "c" for _, _, _, item in got)


def test_memberships_min_items_and_class_normalization(spark):
    html1 = (
        "<h2>List of Data Centers</h2><ul><li>dc-1</li><li>dc-2</li></ul>"
        "<h2>Lonely</h2><ul><li>solo</li></ul>"  # singleton: no votes
        "<ul><li>o1</li><li>o2</li></ul>"  # heading carried: still votes
    )
    html2 = "<h3>data centers</h3><ol><li>dc-1</li><li>dc-9</li></ol>"
    pages = _pages(spark, html1).unionByName(_pages(spark, html2, url="u2"))
    got = {
        (r["item"], r["class"], r["n_lists"])
        for r in list_memberships(list_items(pages)).collect()
    }
    assert got == {
        ("dc-1", "data centers", 2),
        ("dc-2", "data centers", 1),
        ("dc-9", "data centers", 1),
        ("o1", "lonely", 1),
        ("o2", "lonely", 1),
    }


def test_orphan_lists_vote_for_nothing(spark):
    html = "<ul><li>a</li><li>b</li></ul>"
    out = list_memberships(list_items(_pages(spark, html)))
    assert out.count() == 0


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u1", bytearray("<h2>T</h2><ul><li>x</li></ul>", "utf-8"))],
        "url string, html binary",
    )
    out = list_items(df).collect()
    assert {(r["heading"], r["item"]) for r in out} == {("T", "x")}


def test_extraction_plan_zero_udf_zero_shuffle(spark):
    df = list_items(_pages(spark, "<h2>T</h2><ul><li>x</li></ul>"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
