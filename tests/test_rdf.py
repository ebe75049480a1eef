from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.rdf import (
    edges_from_ntriples,
    parse_ntriples,
    to_ntriples,
)

TS = datetime.datetime(2024, 1, 5, 12, 30, 45, 123456)


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("a@0@FILE", "LAUNCH", "proc.exe@PROCESS", TS, 7),
        # every escape class: quote, backslash, newline, tab, space,
        # slash, percent, angle brackets, unicode
        ('na"sty\\id', "REL\nWITH\tWS", "obj with space/slash%pct<>", TS, 1),
        ("ünïcode–id", "CONNECT", "10.0.0.1", TS, 3),
    ]
    return spark.createDataFrame(
        rows, "src string, predicate string, dst string, start_time timestamp, weight long"
    )


def test_three_lines_per_edge(edges):
    lines = to_ntriples(edges)
    assert lines.count() == 3 * edges.count()
    # every line is a single physical line ending in ' .'
    bad = lines.filter(~F.col("line").rlike(r"^<[^\n\r]*> \.$")).count()
    assert bad == 0, "escaped lines must contain no raw newlines"


def test_roundtrip_exact(edges):
    back = edges_from_ntriples(to_ntriples(edges))
    orig = {tuple(r) for r in edges.collect()}
    got = {tuple(r) for r in back.select(*edges.columns).collect()}
    assert got == orig


def test_star_roundtrip_exact(edges):
    from sigraph_spark.operators.rdf import (
        edges_from_ntriples_star,
        to_ntriples_star,
    )

    lines = to_ntriples_star(edges)
    assert lines.count() == 3 * edges.count()
    ann = lines.filter(F.col("line").startswith("<<"))
    assert ann.count() == 2 * edges.count()
    # annotation lines stay single-line and well-formed
    assert ann.filter(~F.col("line").rlike(r"^<< <[^\n\r]*> \.$")) \
        .count() == 0
    back = edges_from_ntriples_star(lines)
    orig = {tuple(r) for r in edges.collect()}
    got = {tuple(r) for r in back.select(*edges.columns).collect()}
    assert got == orig


def test_parse_error_channel(spark):
    lines = spark.createDataFrame(
        [("<a> <b> <c> .",), ("garbage line",), ('<a> <b> "x"^^<t> .',)],
        "line string",
    )
    p = parse_ntriples(lines)
    assert p.filter(F.col("subj").isNull()).count() == 1
    assert p.filter(F.col("obj_iri").isNotNull()).count() == 1
    assert p.filter(F.col("obj_literal").isNotNull()).count() == 1


def test_literal_unescape(spark):
    lines = spark.createDataFrame(
        [('<s> <p> "a\\"b\\\\c\\nd\\te"^^<t> .',)], "line string"
    )
    row = parse_ntriples(lines).collect()[0]
    assert row["obj_literal"] == 'a"b\\c\nd\te'


def test_statement_iri_injective(spark):
    # ('a/b', 'c') and ('a', 'b/c') must NOT collide in the statement IRI
    rows = [
        ("a/b", "P", "c", TS, 1),
        ("a", "P", "b/c", TS, 2),
    ]
    edges = spark.createDataFrame(
        rows, "src string, predicate string, dst string, start_time timestamp, weight long"
    )
    back = edges_from_ntriples(to_ntriples(edges))
    assert back.count() == 2
    got = {(r["src"], r["dst"], r["weight"]) for r in back.collect()}
    assert got == {("a/b", "c", 1), ("a", "b/c", 2)}
