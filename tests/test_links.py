"""Hyperlink extraction + host link graph."""

from __future__ import annotations

from sigraph_spark.operators.links import extract_links, host_link_graph, page_host
from pyspark.sql import functions as F


HTML = (
    '<html><body><a href="https://a.com/x">1</a>'
    "<a href='https://b.com/y?z=1'>2</a>"
    '<a href="/relative">3</a>'
    '<img src="https://c.com/i.png">'  # not an href: ignored
    '<A HREF="https://up.com/">case-sensitive: ignored</A>'
    "</body></html>"
)


def test_extract_links_and_host_graph(spark):
    pages = spark.createDataFrame(
        [("https://src.org/page", HTML)], "url string, html string"
    )
    links = {r["target"] for r in extract_links(pages).collect()}
    assert links == {"https://a.com/x", "https://b.com/y?z=1", "/relative"}

    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(extract_links(pages)).collect()
    }
    # relative target dropped; one link each to a.com and b.com
    assert g == {("src.org", "a.com"): 1, ("src.org", "b.com"): 1}


def test_extract_links_binary_html(spark):
    pages = spark.createDataFrame(
        [("https://s.org/p", HTML.encode())], "url string, html binary"
    )
    assert extract_links(pages).count() == 3


def test_host_graph_aggregates_counts(spark):
    rows = [
        ("https://x.org/1", "https://y.org/a"),
        ("https://x.org/2", "https://y.org/b"),
        ("https://x.org/3", "relative/no/host"),
    ]
    links = spark.createDataFrame(rows, "url string, target string")
    g = host_link_graph(links).collect()
    assert [(r["src_host"], r["dst_host"], r["n_links"]) for r in g] == [
        ("x.org", "y.org", 2)
    ]


def test_page_host_port_and_path(spark):
    df = spark.createDataFrame(
        [("https://h.example.com:8443/a/b?c=1",)], "u string"
    )
    assert df.select(page_host(F.col("u")).alias("h")).collect()[0]["h"] == (
        "h.example.com:8443"
    )
