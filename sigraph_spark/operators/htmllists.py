"""HTML list -> KG membership extraction (list-page set expansion).

Web pages carry category/membership facts in ``<ul>``/``<ol>`` markup
under a heading ("Operating systems", "List of data centers"): the
list-page reading behind classic set-expansion systems (SEAL — Wang &
Cohen, ICDM'07) and Wikipedia "List of X" mining. A webtext KG builder
(BASELINE.json north_star) wants this channel next to tables
(``operators/htmltables.py``), prose (``triples.py``/``hearst.py``) and
the structured-data channels: each list item becomes a candidate member
of the class its heading names.

Flat document-order model (pinned by the ``list_items`` gate + tests):

* one combined regex matches every ``<h1-6>`` heading and every
  ``<ul>``/``<ol>`` block in document order (three zipped
  ``regexp_extract_all`` passes over the same pattern — the
  heading-level group doubles as the is-heading marker, so an EMPTY
  heading still updates context);
* a linear ``F.aggregate`` fold carries the MOST RECENT heading (tag
  stripped, whitespace collapsed) into each list block — never a
  window, no shuffle; lists before the first heading keep heading ``''``
  (kept in ``list_items``, dropped by ``list_memberships``);
* ``list_idx`` numbers every list block on the page (an empty
  ``<ul></ul>`` consumes an index and emits no items); ``item_idx``
  numbers ``<li>...</li>`` items inside the block (unclosed ``<li>`` is
  dropped — the closing tag is the item boundary); item text is
  tag-stripped/trimmed via the shared table cell contract; empty items
  drop (but consume their ``item_idx``);
* nested lists truncate at the FIRST close tag (non-greedy block body)
  — the one-level flattening convention the other channels pin.

``list_memberships`` derives ``(item, class, n_lists)`` claims: class =
lowercased heading with a leading "list of " stripped (the Wikipedia
list-page convention), counted over lists with >= ``min_items`` items
(singleton lists are noise, not sets). A page-local window sizes each
list, then one algebraic agg — the family's only shuffles.

Scale design: extraction is a single narrow map per page (bounded
page-local arrays, zero UDF, zero shuffle — plan-asserted in tests);
the membership agg is map-side combinable and skew-safe (hot classes
split across partial aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sigraph_spark.operators.htmltables import clean_cell

# headed_blocks prepends the heading alternation: group 1 = h-level
# (is-heading marker), group 2 = heading text, group 3 = block body
LI_RE = r"(?is)<li[^>]*>(.*?)</li\s*>"

_LIST_T = "array<struct<heading:string,body:string>>"


def headed_blocks_kernel(html, block_re: str):
    """Column kernel: html -> ``array<struct<heading, body>>`` of every
    block ``block_re`` matches, tagged with the most recent preceding
    ``<h1-6>`` heading in document order ('' before the first one).
    ONE group-0 regex pass over the page + cheap anchored re-extraction
    per (short) match string + a linear ``F.aggregate`` fold — the
    three-zipped-passes form scanned the whole page once per capture
    group (same fix as the microdata/RDFa group pulls, r6)."""
    from sigraph_spark.functions.hof import let

    full_re = r"(?is)<h([1-6])[^>]*>(.*?)</h\1\s*>|" + block_re
    # a heading match ends at ITS closer (the page-level lazy group), so
    # the $-anchored greedy group over the short match string is the
    # identical span; block matches re-extract with block_re itself
    # (anchored at 0 by construction). Non-participating groups were ''
    # in the zipped form — the when/otherwise mirrors that exactly.
    heading_re = r"(?is)^<h[1-6][^>]*>(.*)</h[1-6]\s*>$"
    block_only = r"(?is)" + block_re

    def enrich(m):
        return let(
            F.regexp_extract(m, r"(?i)^<h([1-6])", 1),
            lambda lv: F.struct(
                lv.alias("lv"),
                F.when(lv != "", F.regexp_extract(m, heading_re, 1))
                .otherwise(F.lit("")).alias("ht"),
                F.when(lv == "", F.regexp_extract(m, block_only, 1))
                .otherwise(F.lit("")).alias("bd"),
            ),
        )

    marks = F.transform(
        F.regexp_extract_all(html, F.lit(full_re), 0), enrich
    )
    # linear fold: headings update the carried context, blocks emit
    step = lambda acc, m: F.when(  # noqa: E731
        m["lv"] != "",
        F.struct(clean_cell(m["ht"]).alias("cur"), acc["out"].alias("out")),
    ).otherwise(
        F.struct(
            acc["cur"].alias("cur"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(acc["cur"].alias("heading"), m["bd"].alias("body"))
                ),
            ).alias("out"),
        )
    )
    blocks = F.aggregate(
        marks,
        F.struct(
            F.lit("").alias("cur"), F.array().cast(_LIST_T).alias("out")
        ),
        step,
        lambda acc: acc["out"],
    )
    return F.coalesce(blocks, F.array().cast(_LIST_T))


def headed_blocks(
    pages: DataFrame,
    block_re: str,
    url_col: str = "url",
    html_col: str = "html",
    idx_name: str = "block_idx",
) -> DataFrame:
    """Pages -> ``(url, <idx_name>, heading, body)``: ``posexplode`` of
    the per-page :func:`headed_blocks_kernel` array. The shared
    heading-context engine behind ``list_items`` and
    ``definition_facts`` — zero shuffle, zero UDF."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(headed_blocks_kernel(html, block_re)).alias(idx_name, "_b"),
    ).select(
        "url", idx_name,
        F.col("_b.heading").alias("heading"),
        F.col("_b.body").alias("body"),
    )


def list_items(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, list_idx, item_idx, heading, item)``: every
    ``<li>`` item of every list block, tagged with the most recent
    preceding heading ('' before the first one)."""
    x = headed_blocks(
        pages, r"<[uo]l[^>]*>(.*?)</[uo]l\s*>", url_col, html_col,
        idx_name="list_idx",
    ).select(
        "url", "list_idx", "heading",
        F.posexplode(
            F.regexp_extract_all(F.col("body"), F.lit(LI_RE), 1)
        ).alias("item_idx", "_raw"),
    )
    return x.select(
        "url", "list_idx", "item_idx", "heading",
        clean_cell(F.col("_raw")).alias("item"),
    ).filter(F.col("item") != "")


def list_memberships(
    items: DataFrame, min_items: int = 2
) -> DataFrame:
    """List items -> ``(item, class, n_lists)`` membership claims.

    class = lowercased heading, leading "list of " stripped; lists with
    fewer than ``min_items`` surviving items (or no heading) vote for
    nothing. ``n_lists`` counts supporting (url, list_idx) lists.

    The per-list size check is a window over (url, list_idx) — PAGE-
    LOCAL keys, so the partition is skew-free by construction (a hot
    class never concentrates one key); the final count is algebraic."""
    return (
        _qualified(items, min_items)
        .groupBy("item", "class")
        .agg(F.count(F.lit(1)).alias("n_lists"))
    )


def _qualified(items: DataFrame, min_items: int) -> DataFrame:
    """``(url, list_idx, class, item)`` rows of headed lists with >=
    ``min_items`` surviving items."""
    sized = items.filter(F.col("heading") != "").withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("url", "list_idx")),
    )
    cls = F.regexp_replace(F.lower("heading"), r"^list of\s+", "")
    return sized.filter(F.col("_n") >= min_items).select(
        "url", "list_idx", cls.alias("class"), "item"
    )


_MEMBER_T = "array<struct<subject:string,predicate:string,object:string>>"


def list_claims_kernel(html, min_items: int = 2):
    """Column kernel: html -> ``array<struct<subject, predicate,
    object>>`` membership claims (predicate ``member_of``). Same
    semantics as the exploded path (``_qualified``): a list votes iff
    its heading is non-empty and >= ``min_items`` items survive the
    empty-drop — but the per-list size check is ``F.size`` on the
    page-local array, so the kernel needs NO window at all."""
    from sigraph_spark.functions.hof import let

    empty = F.array().cast(_MEMBER_T)

    def per_block(b):
        cls = F.regexp_replace(F.lower(b["heading"]), r"^list of\s+", "")
        return let(
            F.filter(
                F.transform(
                    F.regexp_extract_all(b["body"], F.lit(LI_RE), 1), clean_cell
                ),
                lambda s: s != "",
            ),
            lambda items: F.when(
                (b["heading"] != "") & (F.size(items) >= min_items),
                F.transform(
                    items,
                    lambda it: F.struct(
                        it.alias("subject"),
                        F.lit("member_of").alias("predicate"),
                        cls.alias("object"),
                    ),
                ),
            ).otherwise(empty),
        )

    k = F.flatten(
        F.transform(
            headed_blocks_kernel(html, r"<[uo]l[^>]*>(.*?)</[uo]l\s*>"),
            per_block,
        )
    )
    return F.coalesce(k, empty)


def list_claims(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_items: int = 2,
) -> DataFrame:
    """Pages -> per-page ``(url, subject, predicate, object)`` membership
    claims (predicate ``member_of``) — the claims-table shape the webtext
    KG plan unions as its ``list`` extractor channel. ``explode`` of
    :func:`list_claims_kernel`: one narrow map, zero shuffle (the
    window the exploded ``_qualified`` path needs collapses into a
    page-local ``F.size`` check)."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col),
        F.explode(list_claims_kernel(html, min_items)).alias("t"),
    ).select(
        F.col(url_col).alias("url"),
        F.col("t.subject").alias("subject"),
        F.col("t.predicate").alias("predicate"),
        F.col("t.object").alias("object"),
    )
