from __future__ import annotations

from sigraph_spark.operators.crawl import parse_sitemaps, schedule_frontier

XML = """<?xml version="1.0"?>
<urlset>
  <url><loc> https://ex.com/a </loc><lastmod>2024-01-02</lastmod></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><lastmod>2024-01-03</lastmod></url>
</urlset>
"""

IDX = """<sitemapindex>
  <sitemap><loc>https://ex.com/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
</sitemapindex>
"""


def test_parse_urlset_and_index(spark):
    df = spark.createDataFrame(
        [("https://ex.com/sitemap.xml", XML), ("https://ex.com/idx.xml", IDX)],
        "sitemap_url string, xml string",
    )
    got = {
        (r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    }
    # loc whitespace trimmed; missing lastmod NULL; loc-less entry dropped
    assert got == {
        ("url", "https://ex.com/a", "2024-01-02"),
        ("url", "https://ex.com/b", None),
        ("index", "https://ex.com/s1.xml", "2024-02-01"),
        ("index", "https://ex.com/s2.xml", None),
    }


def test_schedule_politeness_and_priority(spark):
    rows = [(f"https://h1.com/{c}", p) for c, p in
            [("a", 1), ("b", 9), ("c", 5), ("d", 5), ("e", 0)]]
    rows += [("https://h2.com/x", 7)]
    df = spark.createDataFrame(rows, "url string, prio int")
    got = {r["url"]: (r["host"], r["batch"]) for r in
           schedule_frontier(df, per_host_per_batch=2, priority_col="prio").collect()}
    # h1 order: b(9), c(5), d(5, url tiebreak), a(1), e(0)
    assert got["https://h1.com/b"] == ("h1.com", 0)
    assert got["https://h1.com/c"] == ("h1.com", 0)
    assert got["https://h1.com/d"] == ("h1.com", 1)
    assert got["https://h1.com/a"] == ("h1.com", 1)
    assert got["https://h1.com/e"] == ("h1.com", 2)
    assert got["https://h2.com/x"] == ("h2.com", 0)


def test_schedule_cap_holds_per_batch(spark):
    df = spark.createDataFrame(
        [(f"https://h{i % 3}.com/p{i}",) for i in range(30)], "url string"
    )
    out = schedule_frontier(df, per_host_per_batch=4)
    sizes = {
        (r["host"], r["batch"]): r["n"]
        for r in out.groupBy("host", "batch").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert all(n <= 4 for n in sizes.values())
    assert sum(sizes.values()) == 30
