"""RDFa Lite extraction (operators/rdfa.py).

Pins the RDFa-specific deltas over the shared flat-scope engine
(``scoped_attr_triples``): typeof opens a scope with resource-else-about
-else-blank-node subjects, CURIE/IRI type reduction at the last
``:``/``/``/``#`` segment, multi-token typeof fan-out, property-token
fan-out with the content > tag-attribute > text value chain, nested
typeof+property entity edges to the document-order parent, and the
zero-UDF / zero-shuffle plan invariant shared with microdata.
"""

from __future__ import annotations

from sigraph_spark.operators.rdfa import rdfa_triples


def _pages(spark, html: str, url: str = "u1"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def _rows(spark, html: str):
    return {
        (
            r["tag_idx"], r["scope_idx"], r["subj"],
            r["predicate"], r["obj"], r["kind"],
        )
        for r in rdfa_triples(_pages(spark, html)).collect()
    }


def test_full_page_indexing_and_semantics(spark):
    html = (
        '<p property="stray">orphan</p>'  # before any typeof: drops, idx 0
        '<div vocab="https://schema.org/" typeof="Person" resource="#alice">'
        '<span property="name">Alice A</span>'
        '<meta property="jobTitle" content="Engineer">'
        '<a property="url" href="https://alice.example/">home</a>'
        '<img property="image" src="https://img.example/a.png">'
        '<span property="givenName additionalName">Alice</span>'
        '<span property="empty"></span>'  # empty value drops, takes idx 7
        '<div property="worksFor" typeof="Organization">'
        '<span property="name">ExampleCorp</span>'
        "</div></div>"
        '<section typeof="schema:Event http://ex.org/v#Meetup">'
        '<time property="startDate" datetime="2026-02-01">feb</time>'
        "</section>"
    )
    assert _rows(spark, html) == {
        (1, 0, "#alice", "rdf:type", "Person", "type"),
        (2, 0, "#alice", "name", "Alice A", "literal"),
        (3, 0, "#alice", "jobTitle", "Engineer", "literal"),
        (4, 0, "#alice", "url", "https://alice.example/", "literal"),
        (5, 0, "#alice", "image", "https://img.example/a.png", "literal"),
        # two property tokens fan out from one tag
        (6, 0, "#alice", "givenName", "Alice", "literal"),
        (6, 0, "#alice", "additionalName", "Alice", "literal"),
        # nested scope: entity edge from the parent + its own type row,
        # blank-node subject url#rd<scope_idx>
        (8, 1, "#alice", "worksFor", "u1#rd1", "entity"),
        (8, 1, "u1#rd1", "rdf:type", "Organization", "type"),
        (9, 1, "u1#rd1", "name", "ExampleCorp", "literal"),
        # multi-token typeof: CURIE and IRI both reduce to the last segment
        (10, 2, "u1#rd2", "rdf:type", "Event", "type"),
        (10, 2, "u1#rd2", "rdf:type", "Meetup", "type"),
        (11, 2, "u1#rd2", "startDate", "2026-02-01", "literal"),
    }


def test_orphan_only_page_emits_nothing(spark):
    assert _rows(spark, '<span property="a">x</span>') == set()


def test_resource_wins_over_about_over_blank(spark):
    out = _rows(
        spark,
        "<div typeof='T' about='#a' resource='#r'><i property='p'>v</i></div>"
        "<div typeof='T' about='#a'><i property='p'>v</i></div>",
    )
    assert out == {
        (0, 0, "#r", "rdf:type", "T", "type"),
        (1, 0, "#r", "p", "v", "literal"),
        (2, 1, "#a", "rdf:type", "T", "type"),
        (3, 1, "#a", "p", "v", "literal"),
    }


def test_curie_type_reduction(spark):
    out = _rows(spark, '<div typeof="schema:Product">')
    assert out == {(0, 0, "u1#rd0", "rdf:type", "Product", "type")}


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u1", bytearray('<div typeof="T">', "utf-8"))],
        "url string, html binary",
    )
    out = rdfa_triples(df).collect()
    assert {(r["predicate"], r["obj"]) for r in out} == {("rdf:type", "T")}


def test_plan_zero_udf_zero_shuffle(spark):
    df = rdfa_triples(_pages(spark, '<div typeof="T">'))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_hyphen_prefixed_attrs_are_not_rdfa(spark):
    # data-property / data-typeof are plain custom attributes, not RDFa
    # markup (\b would match after the hyphen; the regexes pin
    # (?<![\w-]) instead)
    out = _rows(
        spark,
        '<div data-typeof="Fake"><span data-property="bogus">x</span></div>'
        '<div typeof="Real"><span property="name">Right</span></div>',
    )
    assert out == {
        (0, 0, "u1#rd0", "rdf:type", "Real", "type"),
        (1, 0, "u1#rd0", "name", "Right", "literal"),
    }
