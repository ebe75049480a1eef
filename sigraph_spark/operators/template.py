"""HTML template fingerprinting: structure-level page clustering.

Large crawls are dominated by TEMPLATED pages — one CMS layout stamped
over millions of urls. Text-level near-dup (MinHash/SimHash over
content) misses them by design: the text differs, the STRUCTURE is
identical. Crawl curation therefore fingerprints the tag skeleton and
clusters pages by it (template detection a la Gibson/Punera/Tomkins,
"The volume and evolution of web page templates", WWW'05) — hot
templates get boilerplate-stripped harder, capped per-template, or
routed to wrapper-induction extractors.

Model (pinned by the ``template_id`` / ``template_clusters`` gates):

* the skeleton is the document-order sequence of OPENING tag names
  (lowercased; closing tags and text carry no structure signal —
  ``</div>`` is determined by its opener);
* ``template_id`` = md5 of the comma-joined skeleton — md5 is
  engine-portable (Spark and DuckDB produce the same hex), so the
  oracle recomputes the exact hash from an arithmetically-constructed
  tag string;
* ``template_clusters`` groups pages by template_id: member count,
  skeleton length, and the lexicographically-first member url as the
  cluster exemplar; clusters below ``min_pages`` drop (singleton
  structures are not templates).

Scale design: fingerprinting is a single narrow map (one
regexp_extract_all + md5 — zero shuffle, zero UDF, plan-asserted);
clustering is one algebraic agg on the 16-byte key. At crawl scale the
agg is skew-prone by NATURE (one mega-template can hold 10^9 pages) —
counts/min are algebraic so partial aggregation absorbs the head; no
per-template row list is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAG_RE = r"<([a-z][a-z0-9]*)"


def page_structure(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, n_tags, template_id)``: the md5 skeleton hash."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    tags = F.regexp_extract_all(F.lower(html), F.lit(TAG_RE), 1)
    return pages.select(
        F.col(url_col).alias("url"),
        F.size(tags).alias("n_tags"),
        F.md5(F.array_join(tags, ",")).alias("template_id"),
    )


def template_clusters(
    structs: DataFrame, min_pages: int = 2
) -> DataFrame:
    """Structure rows -> ``(template_id, n_pages, n_tags, exemplar)``
    clusters with at least ``min_pages`` members."""
    return (
        structs.groupBy("template_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("n_tags").alias("n_tags"),
            F.min("url").alias("exemplar"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )


def novel_templates(
    delta_structs: DataFrame, known_ids: DataFrame
) -> DataFrame:
    """Crawl-delta structure rows -> clusters whose template_id is NOT
    in the stored index — the incremental form (the exact-dedup
    hash-index device applied to structure): each crawl snapshot
    fingerprints only its DELTA and anti-joins the (16-byte-key,
    template-vocabulary-sized) known set, so the corpus is never
    re-fingerprinted. New-template clusters are what a crawl operator
    reviews (a new CMS layout = a new extraction surface); min_pages=1
    here — a single page of an unseen skeleton is exactly the signal.

    ``known_ids`` needs a ``template_id`` column; the anti-join key is
    the hash, so the index probe is an equi-join (broadcastable while
    the template vocabulary is small; AQE picks the strategy at real
    scale)."""
    fresh = delta_structs.join(
        known_ids.select("template_id").distinct(), "template_id", "left_anti"
    )
    return template_clusters(fresh, min_pages=1)
