"""HTML table -> KG triple extraction (infobox-style relational facts).

Web pages carry a large share of their FACTS in ``<table>`` markup —
spec sheets, rosters, infoboxes. A webtext KG construction pipeline
(BASELINE.json north_star) therefore needs a table-understanding operator
next to the sentence-level extractor (``operators/triples.py``): interpret
each table's header row as attribute names and its first column as the row
entity, yielding ``(url, table_idx, subj, predicate, obj)`` triples — the
classic "entity-attribute binary relations from web tables" reading
(Cafarella et al., WebTables, VLDB'08).

Semantics (pinned by the ``table_triples`` gate + tests):
* row 0 is the header (``<th>`` or ``<td>`` — real-web markup is sloppy);
* column 0 is the subject; header[0] names the subject column and emits no
  triple;
* data cell j pairs with header j; RAGGED rows are safe by construction —
  ``arrays_zip`` pads the short side with NULL and the pair is dropped
  (missing trailing cells lose their triples, extra cells beyond the
  header are ignored);
* cell text is tag-stripped (``<b>``/``<a>`` wrappers), whitespace
  collapsed, trimmed; empty subjects/objects emit nothing;
* tables with fewer than 2 rows or 2 columns yield no triples.

Scale design: the whole operator is ONE narrow map on the page row —
``table_triples_kernel`` pairs each data row with its table's header
inside the per-page array (``F.get`` row 0 / ``F.slice`` rows 2..), so
the header join the exploded form would need never happens: zero
shuffle, zero UDF (Java regex and the oracle's RE2 agree on the
non-greedy dotall patterns used here). Arrays live within one page,
bounded by page size. ``table_cells``/``extract_tables`` remain as the
row-level exploded views for callers that want them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TABLE_RE = r"(?s)<table[^>]*>(.*?)</table>"
ROW_RE = r"(?s)<tr[^>]*>(.*?)</tr>"
CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"

_BIG = 1 << 20


def clean_cell(c: Column) -> Column:
    """Tag-strip + whitespace-collapse + trim — the cell-text contract."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, "<[^>]+>", ""), r"\s+", " ")
    )


def extract_tables(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per ``<table>``: ``(url, table_idx, table_html)``."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(html, F.lit(TABLE_RE), 1)).alias(
            "table_idx", "table_html"
        ),
    )


def table_cells(tables: DataFrame) -> DataFrame:
    """``(url, table_idx, row_idx, cells array<string>)`` — cleaned cell
    text per row, still one output row per ``<tr>`` (arrays stay
    page-local)."""
    return tables.select(
        "url", "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("table_html"), F.lit(ROW_RE), 1)
        ).alias("row_idx", "_row_html"),
    ).select(
        "url", "table_idx", "row_idx",
        F.transform(
            F.regexp_extract_all(F.col("_row_html"), F.lit(CELL_RE), 1),
            clean_cell,
        ).alias("cells"),
    )


_TB_ROW_T = (
    "array<struct<table_idx:int,subj:string,predicate:string,obj:string>>"
)


def table_triples_kernel(html):
    """Column kernel: html -> ``array<struct<table_idx, subj, predicate,
    obj>>`` web-table facts. Header/data pairing happens INSIDE the
    per-page array (``F.get`` row 0 vs ``F.slice`` rows 2..), so the
    kernel needs no shuffle at all — the (url, table_idx) header join of
    the old DataFrame form collapses into array ops. ``F.get`` is also
    null-safe where ANSI ``element_at`` would raise on an empty
    ``<tr></tr>`` (the empty subject then drops in the filter)."""
    from sigraph_spark.functions.hof import let

    empty = F.array().cast(_TB_ROW_T)

    def per_table(t, ti):
        rows = F.transform(
            F.regexp_extract_all(t, F.lit(ROW_RE), 1),
            lambda rh: F.transform(
                F.regexp_extract_all(rh, F.lit(CELL_RE), 1), clean_cell
            ),
        )
        return let(
            rows,
            lambda rs: let(
                F.get(rs, 0),
                lambda header: F.coalesce(
                    F.when(
                        header.isNotNull(),
                        F.filter(
                            F.flatten(
                                F.transform(
                                    F.slice(rs, 2, _BIG),
                                    lambda cells: let(
                                        F.get(cells, 0),
                                        lambda subj: F.transform(
                                            F.arrays_zip(
                                                F.slice(header, 2, _BIG).alias("p"),
                                                F.slice(cells, 2, _BIG).alias("o"),
                                            ),
                                            lambda po: F.struct(
                                                ti.alias("table_idx"),
                                                subj.alias("subj"),
                                                po["p"].alias("predicate"),
                                                po["o"].alias("obj"),
                                            ),
                                        ),
                                    ),
                                )
                            ),
                            lambda r: r["subj"].isNotNull()
                            & (r["subj"] != "")
                            & r["predicate"].isNotNull()
                            & (r["predicate"] != "")
                            & r["obj"].isNotNull()
                            & (r["obj"] != ""),
                        ),
                    ),
                    empty,
                ),
            ),
        )

    k = F.flatten(
        F.transform(F.regexp_extract_all(html, F.lit(TABLE_RE), 1), per_table)
    )
    return F.coalesce(k, empty)


def table_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, table_idx, subj, predicate, obj)`` web-table
    facts. ``explode`` of the per-page :func:`table_triples_kernel`
    array — one narrow map, zero shuffle, zero UDF."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    return pages.select(
        F.col(url_col), F.explode(table_triples_kernel(html)).alias("t")
    ).select(
        F.col(url_col).alias("url"),
        F.col("t.table_idx").alias("table_idx"),
        F.col("t.subj").alias("subj"),
        F.col("t.predicate").alias("predicate"),
        F.col("t.obj").alias("obj"),
    )
