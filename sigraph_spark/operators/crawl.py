"""Crawl-side operators: sitemap parsing and politeness-aware frontier
scheduling.

The feed side of a webtext corpus. Sitemaps seed the frontier (url +
lastmod — the recrawl signal); the scheduler turns a frontier into fetch
BATCHES that respect per-host politeness (at most ``per_host_per_batch``
urls of one host per batch) while keeping hosts independent — the
embarrassingly parallel fetch plan a 10^4-worker crawler executes batch by
batch.

Scale design: sitemap parse is a narrow regex map (positional zip of
``<loc>``/``<lastmod>`` captures, the anchors device from
``operators/links.py``). Scheduling is ONE window per host ordered by
(priority desc, url) — linear within the partition; a mega-host makes a
long batch TAIL (batch numbers grow), never a hot shuffle key, because
batch assignment is per-host arithmetic, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# <url><loc>..</loc> with optional <lastmod>..</lastmod> (urlset entries);
# <sitemap><loc>..</loc> marks an index entry pointing at a child sitemap
_URL_RE = r"(?s)<url>(.*?)</url>"
_SM_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemaps(
    sitemaps: DataFrame, src_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Sitemap XML -> ``(sitemap_url, kind, loc, lastmod)``: one row per
    ``<url>`` entry (kind 'url') or ``<sitemap>`` index entry (kind
    'index'; follow-up fetches feed the same parser). ``lastmod`` is NULL
    when absent."""
    out = []
    for kind, block_re in (("url", _URL_RE), ("index", _SM_RE)):
        block = F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(block_re), 1)
        ).alias("_b")
        out.append(
            sitemaps.select(F.col(src_col).alias("sitemap_url"), block)
            .select(
                "sitemap_url",
                F.lit(kind).alias("kind"),
                F.regexp_extract("_b", _LOC_RE, 1).alias("loc"),
                F.nullif(
                    F.regexp_extract("_b", _LASTMOD_RE, 1), F.lit("")
                ).alias("lastmod"),
            )
            .filter(F.col("loc") != "")
        )
    return out[0].unionByName(out[1])


def schedule_frontier(
    frontier: DataFrame,
    per_host_per_batch: int = 2,
    url_col: str = "url",
    priority_col: str | None = None,
) -> DataFrame:
    """Frontier -> ``(url, host, batch)``: batch ``b`` contains at most
    ``per_host_per_batch`` urls per host; within a host, higher
    ``priority_col`` (then lexicographic url — deterministic on any
    partitioning) fetches first. Fetching batch 0, 1, 2, ... in order
    gives every host at most N in-flight urls per wave."""
    from sigraph_spark.operators.links import page_host

    order = [F.col(url_col).asc()]
    if priority_col:
        order.insert(0, F.col(priority_col).desc())
    w = Window.partitionBy("host").orderBy(*order)
    return (
        frontier.withColumn("host", page_host(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "batch",
            F.expr(f"CAST((_rn - 1) DIV {int(per_host_per_batch)} AS BIGINT)"),
        )
        .select(F.col(url_col).alias("url"), "host", "batch")
    )
