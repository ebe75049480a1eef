"""Hyperlink extraction and host-level link-graph construction.

The web-graph side of a Common-Crawl-scale corpus: every KG/ranking/
spam-filtering pipeline wants the (source_host, target_host) link graph
next to the text. Extraction is a JVM-side ``regexp_extract_all`` over
the decoded html — no UDF, fully codegen'd, and the same regex runs in
ANSI SQL for the oracle — followed by one uniform-key aggregation.

Scale notes:
* extraction is a narrow map; the only shuffle is the host-pair groupBy,
  whose algebraic count partially aggregates map-side, absorbing the
  power-law host head (same argument as corpus.domain_stats);
* the href regex is deliberately attribute-anchored (``href="..."`` /
  ``href='...'``) — not an HTML parser; malformed markup yields fewer
  links, never a crash. A production refinement plugs an html5 parser
  into the same contract behind mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r"""href=["']([^"']+)["']"""


def page_host(url: Column) -> Column:
    """Host part of an absolute url (scheme-agnostic, port kept)."""
    return F.substring_index(F.substring_index(url, "://", -1), "/", 1)


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per href occurrence: ``(url, target)``. ``html_col`` may be
    binary (decoded as UTF-8) or string."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.regexp_extract_all(html, F.lit(HREF_RE), 1)).alias("target"),
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """Aggregate page-level links into the host graph:
    ``(src_host, dst_host, n_links)``. Relative targets (no ``://``) have
    no host and are dropped — they never leave the site anyway."""
    return (
        links.filter(F.col("target").contains("://"))
        .select(
            page_host(F.col("url")).alias("src_host"),
            page_host(F.col("target")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
