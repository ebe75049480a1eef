"""GraphML sink — the standard import format for graph tooling
(Gephi, yEd, igraph, NetworkX `read_graphml`).

Same scale shape as the Neo4j bulk-CSV sink (``neo4j_csv.py``): each
element renders to ONE text line via a pure narrow map (escaped
``concat`` projections — zero shuffle, zero UDF, whole-stage codegen;
every escape rule restated in ANSI SQL by the gate oracles), so ten
thousand tasks write shards with no coordination; the constant-size
document header/footer (+ the ``<key>`` declarations) is driver-side.
A viz-sized subgraph can be assembled into one document with
:func:`graphml_document`; at corpus scale you write the line shards
and concatenate on the way out.

XML escaping: ``&`` first, then ``<``, ``>``, ``"`` — applied to both
attribute values and data text (the superset is harmless and keeps one
rule). NULL property values render as empty data elements (readers
treat empty as absent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAPHML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n'
    '  <key id="label" for="node" attr.name="label" attr.type="string"/>\n'
    '  <key id="image" for="node" attr.name="image" attr.type="string"/>\n'
    '  <key id="type" for="edge" attr.name="type" attr.type="string"/>\n'
    '  <key id="weight" for="edge" attr.name="weight" attr.type="long"/>\n'
    '  <key id="start_time" for="edge" attr.name="start_time"'
    ' attr.type="string"/>\n'
    '  <graph id="G" edgedefault="directed">'
)
GRAPHML_FOOTER = "  </graph>\n</graphml>"

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _esc(col: Column) -> Column:
    """XML-escape NULL-safely: & < > " (amp FIRST — escaping the
    escapes is the classic double-encode bug)."""
    c = F.coalesce(col, F.lit(""))
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return F.replace(c, F.lit('"'), F.lit("&quot;"))


def _data(key: str, val: Column) -> Column:
    return F.concat(
        F.lit(f'<data key="{key}">'), _esc(val), F.lit("</data>")
    )


def nodes_xml(nodes: DataFrame) -> DataFrame:
    """Node table (``graph.build_nodes`` shape) -> one ``line`` per
    ``<node>`` element (label + image properties)."""
    return nodes.select(
        F.concat(
            F.lit('    <node id="'),
            _esc(F.col("node_id")),
            F.lit('">'),
            _data("label", F.col("label")),
            _data("image", F.col("image")),
            F.lit("</node>"),
        ).alias("line")
    )


def edges_xml(edges: DataFrame) -> DataFrame:
    """Edge table (``graph.build_edges`` shape) -> one ``line`` per
    ``<edge>`` element (type/weight/start_time properties)."""
    return edges.select(
        F.concat(
            F.lit('    <edge source="'),
            _esc(F.col("src")),
            F.lit('" target="'),
            _esc(F.col("dst")),
            F.lit('">'),
            _data("type", F.col("predicate")),
            _data("weight", F.col("weight").cast("string")),
            _data("start_time", F.date_format("start_time", _TS_FMT)),
            F.lit("</edge>"),
        ).alias("line")
    )


def graphml_document(nodes: DataFrame, edges: DataFrame) -> str:
    """Assemble ONE GraphML document string — for viz-sized subgraphs
    (e.g. a `queries.neighborhood` result), NOT the full corpus; the
    collect is the caller's explicit choice of a small graph."""
    node_lines = [r["line"] for r in nodes_xml(nodes).collect()]
    edge_lines = [r["line"] for r in edges_xml(edges).collect()]
    return "\n".join(
        [GRAPHML_HEADER, *node_lines, *edge_lines, GRAPHML_FOOTER]
    )
