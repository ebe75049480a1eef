"""RDFa Lite (typeof/property) -> KG triples.

The fourth structured-data channel next to JSON-LD, OpenGraph meta tags
(``operators/jsonld.py``) and microdata (``operators/microdata.py``):
RDFa Lite markup inlines schema.org / Dublin Core vocabulary as HTML
attributes (``<div vocab="https://schema.org/" typeof="Person"><span
property="name">...``). Together with microdata and JSON-LD this closes
the Web-Data-Commons channel set a Common-Crawl KG builder mines.

Same flat document-order model as microdata, via the shared
:func:`~sigraph_spark.operators.microdata.scoped_attr_triples` engine
(one pinned execution shape for both attribute-embedded channels):

* every tag carrying ``typeof`` or ``property`` gets a ``tag_idx``;
* each ``typeof`` tag opens a scope; subject = its ``resource`` attr if
  present, else ``about``, else the blank node ``url#rd<scope_idx>``;
* ``typeof`` may hold several whitespace-separated terms (RDFa Core
  allows multi-typed resources); each term emits one rdf:type row with
  its CURIE/IRI reduced to the last ``:``/``/``/``#`` segment
  (``schema:Product`` and ``https://schema.org/Product`` both ->
  ``Product``, matching the bare types of the other channels);
* ``property`` may hold several terms (each emits its own triple);
  a tag with both ``property`` and ``typeof`` is a nested entity edge
  from the document-order parent scope;
* property values resolve content > tag-specific attribute (href/src/
  datetime/value) > trimmed text — the RDFa Lite literal chain. The
  full-RDFa nuances this subset deliberately pins OUT: ``resource`` on a
  non-typeof property tag, ``prefix`` declarations, and ``vocab``
  inheritance (terms are already vocabulary-relative after segment
  reduction).

Scale shape inherited from the engine: three zipped regex passes, one
linear ``F.aggregate`` scope fold, ZERO shuffles / zero Python UDFs
(plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sigraph_spark.operators.microdata import scoped_attr_triples

# one opening tag that carries typeof= or property=, plus its text run.
# (?<![\w-]) instead of \b: \b holds after a hyphen, so plain \b would
# treat data-property="x" / data-typeof="y" (common crawl-HTML custom
# attributes) as RDFa markup and open bogus scopes
RDFA_TAG_RE = (
    r"(?is)<([a-z][a-z0-9]*)\b"
    r"([^<>]*(?<![\w-])(?:typeof|property)\s*=[^<>]*)>([^<]*)"
)


def rdfa_triples(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(url, tag_idx, scope_idx, subj, predicate, obj, kind)`` from
    every typeof/property tag; kind in {type, entity, literal}."""
    return scoped_attr_triples(
        pages, url_col=url_col, html_col=html_col,
        tag_re=RDFA_TAG_RE,
        scope_re=r"(?i)(?<![\w-])typeof\s*=",
        subj_attrs=("resource", "about"),
        type_attr="typeof",
        type_seg_re=r"([^/#:]+)$",
        prop_attr="property",
        blank_prefix="#rd",
    )
