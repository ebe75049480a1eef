"""Breadcrumb taxonomy mining (operators/breadcrumbs.py)."""

from __future__ import annotations

from sigraph_spark.operators.breadcrumbs import (
    breadcrumb_edges,
    breadcrumb_trails,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _trails(df):
    return {(r["url"], r["pos"], r["name"]) for r in df.collect()}


def test_nav_anchor_trail(spark):
    html = ('<html><nav class="breadcrumb"><a href="/">Home</a> &gt; '
            '<a href="/e">Electronics</a> &gt; <span>Phones</span>'
            "</nav><p>body</p></html>")
    got = _trails(breadcrumb_trails(_pages(spark, [("u1", html)])))
    assert got == {("u1", 0, "Home"), ("u1", 1, "Electronics"),
                   ("u1", 2, "Phones")}


def test_ol_li_trail_with_separator_items_and_nesting(spark):
    html = ('<ol class="crumbs breadcrumb-bar"><li><a><b>Home</b></a>'
            "</li><li>›</li><li>Shoes</li></ol>")
    got = _trails(breadcrumb_trails(_pages(spark, [("u", html)])))
    assert got == {("u", 0, "Home"), ("u", 1, "Shoes")}


def test_first_container_wins_and_no_container_drops(spark):
    html = ('<div class="breadcrumb"><a>A</a><a>B</a></div>'
            '<nav class="breadcrumb"><a>X</a></nav>')
    got = _trails(breadcrumb_trails(_pages(
        spark, [("u", html), ("v", "<p>no crumbs here</p>")])))
    assert got == {("u", 0, "A"), ("u", 1, "B")}


def test_max_items_keeps_root_side(spark):
    html = ('<nav class="breadcrumb">'
            + "".join(f"<a>n{i}</a>" for i in range(20)) + "</nav>")
    got = _trails(breadcrumb_trails(_pages(spark, [("u", html)]),
                                    max_items=3))
    assert got == {("u", 0, "n0"), ("u", 1, "n1"), ("u", 2, "n2")}


def test_edges_aggregate_across_pages(spark):
    def nav(*names):
        return ('<nav class="breadcrumb">'
                + "".join(f"<a>{n}</a>" for n in names) + "</nav>")

    rows = [("u1", nav("Home", "A", "A1")),
            ("u2", nav("Home", "A", "A2")),
            ("u3", nav("Home", "B"))]
    edges = breadcrumb_edges(breadcrumb_trails(_pages(spark, rows)))
    got = {(r["narrower"], r["broader"], r["n_pages"])
           for r in edges.collect()}
    assert got == {("A", "Home", 2), ("B", "Home", 1),
                   ("A1", "A", 1), ("A2", "A", 1)}


def test_duplicate_pair_in_one_trail_counts_once(spark):
    html = ('<nav class="breadcrumb"><a>X</a><a>Y</a><a>X</a><a>Y</a>'
            "</nav>")
    edges = breadcrumb_edges(breadcrumb_trails(_pages(spark,
                                                      [("u", html)])))
    got = {(r["narrower"], r["broader"], r["n_pages"])
           for r in edges.collect()}
    assert got == {("Y", "X", 1), ("X", "Y", 1)}
