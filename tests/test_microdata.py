"""HTML microdata extraction (operators/microdata.py).

Pins the flat document-order model the ``microdata_triples`` gate relies
on: tag/scope indexing (orphan itemprops consume a tag_idx then drop),
itemid-else-blank-node subjects, itemtype last-path-segment types
(typeless scopes emit no type row), nested-entity edges to the
document-order parent, multi-token itemprop fan-out, the value priority
chain (content > tag attribute > text), empty-value drops, and the
zero-UDF / zero-shuffle plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.microdata import microdata_triples


def _pages(spark, html: str, url: str = "u1"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def _rows(spark, html: str):
    return {
        (
            r["tag_idx"], r["scope_idx"], r["subj"],
            r["predicate"], r["obj"], r["kind"],
        )
        for r in microdata_triples(_pages(spark, html)).collect()
    }


def test_full_page_indexing_and_semantics(spark):
    html = (
        '<p itemprop="stray">orphan</p>'  # no scope yet: drops, takes idx 0
        '<div itemscope itemtype="https://schema.org/Product" itemid="prod:P1">'
        '<h1 itemprop="name">Widget 5</h1>'
        '<meta itemprop="sku" content="SKU-9">'
        '<a itemprop="url" href="https://shop.example/w5">buy</a>'
        '<img itemprop="image" src="https://img.example/w5.png">'
        '<span itemprop="brand alternateName">BrandX</span>'
        '<span itemprop="empty"></span>'  # empty value: drops, takes idx 7
        '<a itemprop="seller" content="SellerZ" href="https://s.example/z">s</a>'
        '<div itemprop="offers" itemscope itemtype="https://schema.org/Offer">'
        '<time itemprop="validFrom" datetime="2026-01-03">jan</time>'
        '<span itemprop="price">42</span>'
        "</div></div>"
        '<section itemscope><span itemprop="note">note 7</span></section>'
    )
    assert _rows(spark, html) == {
        (1, 0, "prod:P1", "rdf:type", "Product", "type"),
        (2, 0, "prod:P1", "name", "Widget 5", "literal"),
        # content attribute
        (3, 0, "prod:P1", "sku", "SKU-9", "literal"),
        # tag-specific attributes: href / src / datetime
        (4, 0, "prod:P1", "url", "https://shop.example/w5", "literal"),
        (5, 0, "prod:P1", "image", "https://img.example/w5.png", "literal"),
        # two itemprop tokens fan out from one tag
        (6, 0, "prod:P1", "brand", "BrandX", "literal"),
        (6, 0, "prod:P1", "alternateName", "BrandX", "literal"),
        # content beats href
        (8, 0, "prod:P1", "seller", "SellerZ", "literal"),
        # nested scope: entity edge from the parent + its own type row,
        # blank-node subject url#md<scope_idx>
        (9, 1, "prod:P1", "offers", "u1#md1", "entity"),
        (9, 1, "u1#md1", "rdf:type", "Offer", "type"),
        (10, 1, "u1#md1", "validFrom", "2026-01-03", "literal"),
        (11, 1, "u1#md1", "price", "42", "literal"),
        # typeless scope: no rdf:type row, but props attach (idx 12 silent)
        (13, 2, "u1#md2", "note", "note 7", "literal"),
    }


def test_orphan_only_page_emits_nothing(spark):
    assert _rows(spark, '<span itemprop="a">x</span>') == set()


def test_itemid_wins_over_blank_node(spark):
    out = _rows(
        spark,
        "<div itemscope itemid='thing:9'><i itemprop='a'>v</i></div>",
    )
    assert out == {(1, 0, "thing:9", "a", "v", "literal")}


def test_toplevel_itemprop_scope_has_no_parent_edge(spark):
    # a scope that carries itemprop but is the FIRST scope: no parent to
    # attach to, so only its own type row survives
    out = _rows(
        spark,
        '<div itemprop="main" itemscope itemtype="T"><b itemprop="x">1</b></div>',
    )
    assert out == {
        (0, 0, "u1#md0", "rdf:type", "T", "type"),
        (1, 0, "u1#md0", "x", "1", "literal"),
    }


def test_itemtype_last_segment_and_hash_fragment(spark):
    out = _rows(spark, '<div itemscope itemtype="https://ex.org/v#Breadcrumb">')
    assert out == {(0, 0, "u1#md0", "rdf:type", "Breadcrumb", "type")}


def test_time_falls_back_to_text_without_datetime(spark):
    out = _rows(
        spark,
        '<div itemscope><time itemprop="when">2026</time></div>',
    )
    assert out == {(1, 0, "u1#md0", "when", "2026", "literal")}


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u1", bytearray('<div itemscope itemtype="T">', "utf-8"))],
        "url string, html binary",
    )
    out = microdata_triples(df).collect()
    assert {(r["predicate"], r["obj"]) for r in out} == {("rdf:type", "T")}


def test_plan_zero_udf_zero_shuffle(spark):
    df = microdata_triples(_pages(spark, '<div itemscope itemtype="T">'))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_hyphen_prefixed_attrs_are_not_microdata(spark):
    # data-itemprop / data-itemscope are plain custom attributes, not
    # microdata markup (\b would match after the hyphen; the regexes pin
    # (?<![\w-]) instead) — and a data-content attribute must not feed
    # the value chain of a REAL property tag
    out = _rows(
        spark,
        '<div data-itemscope data-itemtype="https://schema.org/Fake">'
        '<span data-itemprop="bogus">x</span></div>'
        '<div itemscope itemtype="https://schema.org/Real">'
        '<span itemprop="name" data-content="WRONG">Right</span></div>',
    )
    assert out == {
        (0, 0, "u1#md0", "rdf:type", "Real", "type"),
        (1, 0, "u1#md0", "name", "Right", "literal"),
    }
