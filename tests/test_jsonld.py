"""schema.org JSON-LD + OpenGraph meta extraction (operators/jsonld.py).

Pins the extraction semantics the ``jsonld_triples`` / ``meta_triples``
gates rely on: block/element indexing (malformed blocks consume an index),
the three block shapes (object / top-level array / @graph wrapper),
blank-node subject naming, one-level nested-object flattening
(name-then-@id), array fan-out, scalar raw capture (numbers keep their
JSON token text), drop rules (empty strings, nested objects with neither
name nor @id), and the zero-UDF / zero-shuffle plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.jsonld import jsonld_triples, meta_triples


def _pages(spark, html: str, url: str = "u1"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def _ld(body: str) -> str:
    return f'<script type="application/ld+json">{body}</script>'


def _rows(spark, html: str):
    return {
        (r["block_idx"], r["elem_idx"], r["subj"], r["predicate"], r["obj"], r["kind"])
        for r in jsonld_triples(_pages(spark, html)).collect()
    }


def test_object_block_scalars_arrays_nested(spark):
    html = _ld(
        '{"@context":"https://schema.org","@type":"Product","name":"w1",'
        '"gtin":"","price":4.99,"inStock":true,'
        '"offers":{"@type":"Offer","name":"deal"},'
        '"maker":{"@id":"org:1"},"broken":{"@type":"Thing"},'
        '"sameAs":["https://a/1","https://b/1"]}'
    )
    out = _rows(spark, html)
    subj = "u1#ld0-0"
    assert out == {
        (0, 0, subj, "rdf:type", "Product", "type"),
        (0, 0, subj, "name", "w1", "literal"),
        # numbers/booleans keep their JSON token text (raw capture)
        (0, 0, subj, "price", "4.99", "literal"),
        (0, 0, subj, "inStock", "true", "literal"),
        # nested object: name preferred, @id fallback; neither -> dropped
        (0, 0, subj, "offers", "deal", "entity"),
        (0, 0, subj, "maker", "org:1", "entity"),
        (0, 0, subj, "sameAs", "https://a/1", "literal"),
        (0, 0, subj, "sameAs", "https://b/1", "literal"),
        # "gtin":"" dropped; @context dropped
    }


def test_type_array_fans_out(spark):
    out = _rows(spark, _ld('{"@type":["Product","Thing"],"name":"x"}'))
    assert {(p, o) for (_, _, _, p, o, k) in out if k == "type"} == {
        ("rdf:type", "Product"),
        ("rdf:type", "Thing"),
    }


def test_toplevel_array_and_at_id_subjects(spark):
    html = _ld(
        '[{"@id":"person:7","@type":"Person","name":"P"},'
        '"noise",'
        '{"@type":"Org","name":"O"}]'
    )
    out = _rows(spark, html)
    # the non-object element still consumed elem_idx 1
    assert out == {
        (0, 0, "person:7", "rdf:type", "Person", "type"),
        (0, 0, "person:7", "name", "P", "literal"),
        (0, 2, "u1#ld0-2", "rdf:type", "Org", "type"),
        (0, 2, "u1#ld0-2", "name", "O", "literal"),
    }


def test_graph_wrapper(spark):
    html = _ld(
        '{"@context":"https://schema.org","@graph":'
        '[{"@id":"c:1","@type":"City","population":1000}]}'
    )
    assert _rows(spark, html) == {
        (0, 0, "c:1", "rdf:type", "City", "type"),
        (0, 0, "c:1", "population", "1000", "literal"),
    }


def test_malformed_block_consumes_index(spark):
    html = (
        _ld('{"@type":"Broken",')  # malformed -> drops, still block 0
        + "<script>var x=1;</script>"  # plain script: not matched at all
        + '<script type="text/javascript">var y=2;</script>'
        + _ld('{"@type":"Ok","name":"n"}')
    )
    out = _rows(spark, html)
    assert out == {
        (1, 0, "u1#ld1-0", "rdf:type", "Ok", "type"),
        (1, 0, "u1#ld1-0", "name", "n", "literal"),
    }


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(_ld('{"@type":"T","name":"b"}'), "utf-8"))],
        "url string, html binary",
    )
    out = jsonld_triples(df).collect()
    assert {(r["predicate"], r["obj"]) for r in out} == {
        ("rdf:type", "T"),
        ("name", "b"),
    }


def test_meta_triples_prefix_filter_and_indexing(spark):
    html = (
        '<meta property="og:title" content="T1">'
        '<meta name="viewport" content="width=device-width">'  # filtered
        '<meta property="og:locale" content="">'  # empty -> dropped
        '<meta name="twitter:card" content="summary">'
        '<meta name="description" content="d1">'
    )
    out = {
        (r["meta_idx"], r["predicate"], r["obj"])
        for r in meta_triples(_pages(spark, html)).collect()
    }
    # meta_idx counts ALL matched tags in document order, pre-filter
    assert out == {
        (0, "og:title", "T1"),
        (3, "twitter:card", "summary"),
        (4, "description", "d1"),
    }


def test_plan_zero_udf_zero_shuffle(spark):
    pages = _pages(spark, _ld('{"@type":"T","name":"x"}'))
    for df in (jsonld_triples(pages), meta_triples(pages)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan
