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

Scale design: everything up to the header join is a NARROW map on the page
row (three nested ``regexp_extract_all`` + ``posexplode`` — arrays live
within one page, bounded by page size). The only shuffle pairs data rows
with their table's header, keyed (url, table_idx) — page-local keys, no
skew (a hot DOMAIN never concentrates one key). Zero UDF: Java regex and
the oracle's RE2 agree on the non-greedy dotall patterns used here.
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


def table_triples(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> ``(url, table_idx, subj, predicate, obj)`` web-table facts."""
    cells = table_cells(extract_tables(pages, url_col, html_col))
    header = cells.filter(F.col("row_idx") == 0).select(
        "url", "table_idx", F.col("cells").alias("header")
    )
    data = cells.filter(F.col("row_idx") > 0)
    paired = data.join(header, ["url", "table_idx"]).select(
        "url", "table_idx",
        F.element_at("cells", 1).alias("subj"),
        F.explode(
            F.arrays_zip(
                F.slice("header", 2, _BIG).alias("predicate"),
                F.slice("cells", 2, _BIG).alias("obj"),
            )
        ).alias("_p"),
    )
    return paired.select(
        "url", "table_idx", "subj",
        F.col("_p.predicate").alias("predicate"),
        F.col("_p.obj").alias("obj"),
    ).filter(
        (F.col("subj") != "")
        & F.col("predicate").isNotNull() & (F.col("predicate") != "")
        & F.col("obj").isNotNull() & (F.col("obj") != "")
    )
