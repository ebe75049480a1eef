"""HTML definition-list -> KG key-value facts (infobox channel).

``<dl><dt>CPU</dt><dd>64-core</dd>...`` markup is the web's inline
infobox: attribute/value pairs about whatever entity the enclosing
section describes. DBpedia-style extraction reads these as
``(section entity, key, value)`` facts — the key-value complement to
the membership reading of ``<ul>`` lists (``operators/htmllists.py``)
and the row-entity reading of ``<table>`` grids
(``operators/htmltables.py``).

Flat document-order model (pinned by the ``dl_facts`` gate + tests):

* subject = the most recent preceding ``<h1-6>`` heading — the shared
  :func:`~sigraph_spark.operators.htmllists.headed_blocks` context fold
  (dl blocks before the first heading keep ``''`` and are DROPPED: a
  fact needs a subject);
* inside a block, the k-th ``<dt>`` pairs with the k-th ``<dd>``
  positionally (two extract passes + ``arrays_zip``; ragged blocks pad
  with NULL and the pair drops) — multiple ``<dd>`` per ``<dt>``
  misalign by design, the one-level flattening convention every channel
  here pins;
* key/value text is tag-stripped/trimmed via the shared cell contract;
  empty keys or values drop (but consume their ``pair_idx``);
* nested ``<dl>`` truncates at the first close tag (non-greedy body).

Scale design: single narrow map per page — bounded page-local arrays,
zero shuffle, zero UDF (plan-asserted in tests). Downstream claim
fusion does the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sigraph_spark.operators.htmltables import clean_cell

DL_RE = r"<dl[^>]*>(.*?)</dl\s*>"
DT_RE = r"(?is)<dt[^>]*>(.*?)</dt\s*>"
DD_RE = r"(?is)<dd[^>]*>(.*?)</dd\s*>"


_DL_ROW_T = (
    "array<struct<dl_idx:int,pair_idx:int,"
    "subject:string,key:string,value:string>>"
)


def dl_facts_kernel(html):
    """Column kernel: html -> ``array<struct<dl_idx, pair_idx, subject,
    key, value>>`` of every positionally-paired dt/dd of every headed
    definition list — the per-page array form feeding the fused
    one-scan extraction pass (``operators/fusedscan.py``)."""
    from sigraph_spark.operators.htmllists import headed_blocks_kernel

    empty = F.array().cast(_DL_ROW_T)

    def per_block(b, di):
        pairs = F.arrays_zip(
            F.regexp_extract_all(b["body"], F.lit(DT_RE), 1).alias("k"),
            F.regexp_extract_all(b["body"], F.lit(DD_RE), 1).alias("v"),
        )
        return F.when(
            b["heading"] != "",
            F.filter(
                F.transform(
                    pairs,
                    lambda p, pi: F.struct(
                        di.alias("dl_idx"), pi.alias("pair_idx"),
                        b["heading"].alias("subject"),
                        clean_cell(p["k"]).alias("key"),
                        clean_cell(p["v"]).alias("value"),
                    ),
                ),
                lambda r: r["key"].isNotNull() & (r["key"] != "")
                & r["value"].isNotNull() & (r["value"] != ""),
            ),
        ).otherwise(empty)

    k = F.flatten(F.transform(headed_blocks_kernel(html, DL_RE), per_block))
    return F.coalesce(k, empty)


def dl_facts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, dl_idx, pair_idx, subject, key, value)``: every
    positionally-paired dt/dd of every headed definition list.
    ``explode`` of the per-page :func:`dl_facts_kernel` array."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col), F.explode(dl_facts_kernel(html)).alias("t")
    ).select(
        F.col(url_col).alias("url"),
        F.col("t.dl_idx").alias("dl_idx"),
        F.col("t.pair_idx").alias("pair_idx"),
        F.col("t.subject").alias("subject"),
        F.col("t.key").alias("key"),
        F.col("t.value").alias("value"),
    )


def dl_claims(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Claims-table shape for the webtext KG plan: ``(url, subject,
    predicate, object)`` with predicate = lowercased key."""
    f = dl_facts(pages, url_col, html_col)
    return f.select(
        "url",
        F.col("subject"),
        F.lower("key").alias("predicate"),
        F.col("value").alias("object"),
    )
