from __future__ import annotations

import csv
import datetime
import glob
import io
import json
import os

import pytest

from sigraph_spark.operators.neo4j_csv import (
    NODES_HEADER,
    RELS_HEADER,
    array_delim_conflicts,
    import_command,
    nodes_csv,
    rels_csv,
    write_neo4j_import,
)


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, label string, image string, "
        "related_span_ids array<string>, related_trace_ids array<string>",
    )


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "src string, predicate string, dst string, "
        "start_time timestamp, weight long",
    )


def test_nodes_rfc4180_roundtrip(spark):
    # hostile values: embedded quote, comma, newline — must survive a
    # standards-compliant csv reader round trip
    df = _nodes(
        spark,
        [
            ('he said "hi"@FILE', "FILE", 'img, "v1"\nline2', ["s1", "s2"], ["t1"]),
            ("plain@FILE", "FILE", None, [], ["t2"]),
        ],
    )
    lines = [r["line"] for r in nodes_csv(df).collect()]
    parsed = list(csv.reader(io.StringIO("\n".join(sorted(lines)))))
    assert parsed == [
        ['he said "hi"@FILE', "FILE", 'img, "v1"\nline2', "s1;s2", "t1"],
        ["plain@FILE", "FILE", "", "", "t2"],
    ]
    # field count matches the header contract
    assert all(len(row) == len(NODES_HEADER.split(",")) for row in parsed)


def test_rels_fields_and_timestamp(spark):
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    df = _edges(spark, [("a@FILE", "LAUNCH", "b@PROCESS", ts, 7)])
    [line] = [r["line"] for r in rels_csv(df).collect()]
    assert line == '"a@FILE","b@PROCESS","LAUNCH","7","2024-03-01T12:30:45.123456"'
    assert len(next(csv.reader([line]))) == len(RELS_HEADER.split(","))


def test_array_delim_conflicts(spark):
    df = _nodes(
        spark,
        [
            ("ok@FILE", "FILE", None, ["s1"], ["t1"]),
            ("bad@FILE", "FILE", None, ["s;1"], ["t1"]),
        ],
    )
    bad = array_delim_conflicts(df).collect()
    assert [r["node_id"] for r in bad] == ["bad@FILE"]


def test_write_layout_and_command(spark, tmp_path):
    out = str(tmp_path / "neo4j")
    nodes = _nodes(spark, [("a@FILE", "FILE", "img", ["s1"], ["t1"])])
    edges = _edges(
        spark,
        [("a@FILE", "LAUNCH", "b@PROCESS", datetime.datetime(2024, 1, 1), 1)],
    )
    cmd = write_neo4j_import(nodes, edges, out)
    assert cmd == import_command(out)
    assert "--nodes=" in cmd and "--array-delimiter" in cmd
    with open(os.path.join(out, "nodes.header.csv")) as fh:
        assert fh.read().strip() == NODES_HEADER
    with open(os.path.join(out, "rels.header.csv")) as fh:
        assert fh.read().strip() == RELS_HEADER
    node_lines = []
    for f in glob.glob(os.path.join(out, "nodes", "part-*")):
        node_lines += open(f).read().splitlines()
    assert node_lines == ['"a@FILE","FILE","img","s1","t1"']


def test_write_rejects_delimiter_conflict(spark, tmp_path):
    nodes = _nodes(spark, [("a@FILE", "FILE", None, ["s;1"], [])])
    edges = _edges(spark, [])
    with pytest.raises(ValueError, match="array delimiter"):
        write_neo4j_import(nodes, edges, str(tmp_path / "x"))


def test_opensearch_bulk_lines_json_valid(spark):
    from sigraph_spark.operators.opensearch_bulk import bulk_index_lines

    df = spark.createDataFrame(
        [
            (
                "u-1", "span-1", "tr-1",
                datetime.datetime(2024, 3, 1, 12, 0, 0, 5),
                'a"b@FILE@CREATE@NOT_ACTOR', "proc\t1.exe",
                "span-p-1", 3, ["rule-0", "rule-2"],
            ),
            ("u-2", "span-2", "tr-2", datetime.datetime(2024, 3, 1), "x@FILE@CREATE@NOT_ACTOR", None, None, 1, None),
        ],
        "unit_id string, span_id string, trace_id string, timestamp timestamp, "
        "system_provenance string, process_name string, parent_span_id string, "
        "weight int, related_rule_ids array<string>",
    )
    out = {r["line"].split("\n")[0]: r["line"].split("\n")[1] for r in bulk_index_lines(df).collect()}
    # both lines of each pair are valid JSON; escapes round-trip
    for action in out:
        assert json.loads(action)["index"]["_index"] == "syslog"
    doc1 = json.loads(out['{"index":{"_index":"syslog","_id":"span-1"}}'])
    assert doc1["raw_data"]["system_provenance"] == 'a"b@FILE@CREATE@NOT_ACTOR'
    assert doc1["raw_data"]["process_name"] == "proc\t1.exe"
    assert doc1["rule_ids"] == ["rule-0", "rule-2"]
    assert doc1["timestamp"] == "2024-03-01T12:00:00.000005"
    doc2 = json.loads(out['{"index":{"_index":"syslog","_id":"span-2"}}'])
    assert doc2["rule_ids"] is None and doc2["raw_data"]["process_name"] is None
    # fixed SyslogModel field order (byte-determinism contract)
    assert list(doc1) == [
        "unit_id", "span_id", "trace_id", "timestamp", "tactics", "rule_ids", "raw_data",
    ]


def test_opensearch_write_bulk_one_request_per_file(spark, tmp_path):
    from sigraph_spark.operators.opensearch_bulk import bulk_command, write_bulk

    df = spark.createDataFrame(
        [
            ("u-1", f"span-{i}", "tr-1", datetime.datetime(2024, 1, 1), "x@FILE@CREATE@NOT_ACTOR", None, None, 1, None)
            for i in range(10)
        ],
        "unit_id string, span_id string, trace_id string, timestamp timestamp, "
        "system_provenance string, process_name string, parent_span_id string, "
        "weight int, related_rule_ids array<string>",
    )
    from sigraph_spark.operators.opensearch_bulk import bulk_index_lines

    out = str(tmp_path / "bulk")
    cmd = write_bulk(bulk_index_lines(df.coalesce(1)), out, max_docs_per_file=4)
    assert cmd == bulk_command(out)
    files = sorted(glob.glob(os.path.join(out, "part-*")))
    # 10 docs at <=4/file -> 3 request bodies, each valid NDJSON with
    # alternating action/source lines
    assert len(files) == 3
    total = 0
    for f in files:
        lines = open(f).read().splitlines()
        assert len(lines) % 2 == 0 and len(lines) <= 8
        for i, ln in enumerate(lines):
            obj = json.loads(ln)
            assert ("index" in obj) == (i % 2 == 0)
        total += len(lines) // 2
    assert total == 10


def test_index_template_covers_all_emitted_fields():
    from sigraph_spark.operators.opensearch_bulk import index_template

    t = index_template()
    props = t["template"]["mappings"]["properties"]
    assert set(props) == {
        "unit_id", "span_id", "trace_id", "timestamp", "tactics", "rule_ids", "raw_data",
    }
    assert set(props["raw_data"]["properties"]) == {
        "system_provenance", "process_name", "parent_span_id", "weight",
    }
    assert t["template"]["mappings"]["dynamic"] == "strict"
