"""Breadcrumb-trail mining: site taxonomies from navigation markup.

Web pages publish their place in a site hierarchy as breadcrumb
navigation (``<nav class="breadcrumb">Home > Electronics > Phones``) —
across a crawl those trails are a free, high-precision taxonomy (the
device behind site-structure KGs; schema.org BreadcrumbList carried in
JSON-LD rides the existing ``jsonld.py`` channel — this module mines
the HTML container form).

* :func:`breadcrumb_trails` — ``(url, pos, name)``: the FIRST
  breadcrumb container per page (nav/ol/ul/div whose class mentions
  ``breadcrumb``), its item texts in document order through the shared
  ``clean_cell`` contract; separator-only items (``>``, ``/``, ``»``,
  ``›``) drop, positions re-number after the drop.
* :func:`breadcrumb_edges` — ``(narrower, broader, n_pages)``: each
  adjacent trail pair read as a taxonomy edge (item at pos+1 is
  narrower than its predecessor), aggregated across the crawl with
  page counts — corroboration, the same evidence-counting convention
  as ``hearst.py``'s taxonomy induction.

Scale shape: trail extraction is a narrow map (regexp in codegen, no
UDF); adjacent pairing is a ``lead()`` window partitioned by url
(group size = trail length, bounded by ``max_items`` — never a skew
key); the only real shuffle is the final (narrower, broader) count.
Reference parity: hongsam14/sigraph has no web-mining plane — this
extends the webtext KG family SURVEY §2 adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .htmltables import clean_cell

__all__ = ["breadcrumb_trails", "breadcrumb_edges"]

# the first container whose class mentions 'breadcrumb' (backref keeps
# open/close tags paired; (?:(?!</tag>).)* stops at the FIRST close)
CRUMB_BLOCK_RE = (
    r"(?is)<(nav|ol|ul|div)\b[^>]*\bclass=[\"'][^\"']*breadcrumb"
    r"[^\"']*[\"'][^>]*>((?:(?!</\1\s*>).)*)</\1\s*>"
)
# item texts: anchors OR li/span bodies (a breadcrumb tail is often a
# bare <li>Current Page</li> with no link)
ITEM_RE = r"(?is)<(?:a|li|span)\b[^>]*>((?:(?!</?(?:a|li|span)\b).)*)"

_SEPARATORS = (">", "/", "»", "›", "·", "|", "-", "&gt;")


def breadcrumb_trails(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_items: int = 12,
) -> DataFrame:
    """Pages -> ``(url, pos, name)`` for the first breadcrumb container
    per page; trails longer than ``max_items`` keep their first
    ``max_items`` entries (site-root side — the stable part)."""
    src = pages.schema[html_col].dataType.typeName()
    html = (F.decode(F.col(html_col), "UTF-8") if src == "binary"
            else F.col(html_col))
    block = F.regexp_extract(html, CRUMB_BLOCK_RE, 2)
    items = F.regexp_extract_all(F.col("_block"), F.lit(ITEM_RE), 1)
    names = F.filter(
        F.transform(items, clean_cell),
        lambda s: (s != "") & ~s.isin(*_SEPARATORS),
    )
    return (
        pages.select(F.col(url_col).alias("url"), block.alias("_block"))
        .filter(F.col("_block") != "")
        .select("url", F.slice(names, 1, max_items).alias("_names"))
        .select("url", F.posexplode("_names").alias("pos", "name"))
    )


def breadcrumb_edges(
    trails: DataFrame,
    min_pages: int = 1,
) -> DataFrame:
    """Trails -> ``(narrower, broader, n_pages)`` taxonomy edges with
    cross-page corroboration counts (``n_pages`` = distinct urls whose
    trail contains the adjacent pair)."""
    w = Window.partitionBy("url").orderBy("pos")
    pairs = (
        trails.withColumn("_next", F.lead("name").over(w))
        .filter(F.col("_next").isNotNull())
        .select("url", F.col("_next").alias("narrower"),
                F.col("name").alias("broader"))
        .distinct()
    )
    return (
        pairs.groupBy("narrower", "broader")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"))
        .filter(F.col("n_pages") >= min_pages)
    )
