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

from sigraph_spark.operators.htmllists import headed_blocks
from sigraph_spark.operators.htmltables import clean_cell

DL_RE = r"<dl[^>]*>(.*?)</dl\s*>"
DT_RE = r"(?is)<dt[^>]*>(.*?)</dt\s*>"
DD_RE = r"(?is)<dd[^>]*>(.*?)</dd\s*>"


def dl_facts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, dl_idx, pair_idx, subject, key, value)``: every
    positionally-paired dt/dd of every headed definition list."""
    x = headed_blocks(
        pages, DL_RE, url_col, html_col, idx_name="dl_idx"
    ).filter(F.col("heading") != "").select(
        "url", "dl_idx",
        F.col("heading").alias("subject"),
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all(F.col("body"), F.lit(DT_RE), 1).alias("k"),
                F.regexp_extract_all(F.col("body"), F.lit(DD_RE), 1).alias("v"),
            )
        ).alias("pair_idx", "_p"),
    )
    return x.select(
        "url", "dl_idx", "pair_idx", "subject",
        clean_cell(F.col("_p.k")).alias("key"),
        clean_cell(F.col("_p.v")).alias("value"),
    ).filter(
        F.col("key").isNotNull() & (F.col("key") != "")
        & F.col("value").isNotNull() & (F.col("value") != "")
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
