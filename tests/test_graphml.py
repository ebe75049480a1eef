"""GraphML sink: escape rules on hostile strings, and the assembled
document must parse as well-formed XML (stdlib ElementTree as the
independent reader) with every element and property intact."""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET

from sigraph_spark.operators.graphml import (
    GRAPHML_FOOTER,
    GRAPHML_HEADER,
    edges_xml,
    graphml_document,
    nodes_xml,
)

NS = "{http://graphml.graphdrawing.org/xmlns}"
HOSTILE = 'a&b<c>d"e\'f'


def _nodes(spark):
    return spark.createDataFrame(
        [
            ("n1@PROCESS", "PROCESS", HOSTILE),
            ("n2@FILE", "FILE", None),
        ],
        "node_id string, label string, image string",
    )


def _edges(spark):
    t = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    return spark.createDataFrame(
        [("n1@PROCESS", HOSTILE, "n2@FILE", t, 3)],
        "src string, predicate string, dst string, "
        "start_time timestamp, weight long",
    )


def test_escaping_and_null(spark):
    lines = [r["line"] for r in nodes_xml(_nodes(spark)).collect()]
    hostile_line = next(ln for ln in lines if "n1" in ln)
    assert "&amp;b&lt;c&gt;d&quot;e'f" in hostile_line
    assert "&amp;amp;" not in hostile_line  # no double-encode
    null_line = next(ln for ln in lines if "n2" in ln)
    assert '<data key="image"></data>' in null_line


def test_document_parses_and_roundtrips(spark):
    doc = graphml_document(_nodes(spark), _edges(spark))
    root = ET.fromstring(doc)  # independent reader: must be valid XML
    graph = root.find(f"{NS}graph")
    nodes = graph.findall(f"{NS}node")
    edges = graph.findall(f"{NS}edge")
    assert len(nodes) == 2 and len(edges) == 1
    byid = {n.get("id"): n for n in nodes}
    img = byid["n1@PROCESS"].find(f'{NS}data[@key="image"]')
    assert img.text == HOSTILE  # unescaped faithfully by the reader
    e = edges[0]
    assert e.get("source") == "n1@PROCESS" and e.get("target") == "n2@FILE"
    assert e.find(f'{NS}data[@key="type"]').text == HOSTILE
    assert e.find(f'{NS}data[@key="weight"]').text == "3"
    assert e.find(f'{NS}data[@key="start_time"]').text == (
        "2024-01-02T03:04:05.123456"
    )
    assert doc.startswith(GRAPHML_HEADER) and doc.endswith(GRAPHML_FOOTER)


def test_line_shards_concatenate_to_a_valid_document(spark):
    """The at-scale path: shard lines + constant header/footer must
    equal the assembled document."""
    n = "\n".join(r["line"] for r in nodes_xml(_nodes(spark)).collect())
    e = "\n".join(r["line"] for r in edges_xml(_edges(spark)).collect())
    manual = "\n".join([GRAPHML_HEADER, n, e, GRAPHML_FOOTER])
    assert manual == graphml_document(_nodes(spark), _edges(spark))
    ET.fromstring(manual)