"""HTML microdata (itemscope/itemprop) -> KG triples.

The third Web-Data-Commons structured-data channel next to JSON-LD and
OpenGraph meta tags (``operators/jsonld.py``): schema.org markup inlined
as HTML attributes (``<div itemscope itemtype="https://schema.org/
Product"><span itemprop="name">...``). Real Common-Crawl KG pipelines
mine all three channels, and microdata is historically the largest by
page count, so the webtext KG engine (BASELINE.json north_star) needs it
as a first-class extractor view.

A faithful microdata parse needs a DOM tree; a Spark-scale extractor
needs a bounded columnar one. This module pins a FLAT document-order
model (the same one-level-flattening convention as the JSON-LD channel):

* every opening tag carrying ``itemscope`` or ``itemprop`` gets a
  ``tag_idx`` in document order;
* each ``itemscope`` tag starts a new scope; ``scope_idx`` is the running
  count of scopes seen. Property tags attach to the MOST RECENT scope;
  tags before the first scope (orphan itemprops) are dropped;
* subject of a scope = its ``itemid`` attribute if present, else the
  deterministic blank node ``url#md<scope_idx>``;
* ``itemtype`` emits ``(subj, rdf:type, <last path segment>)`` with kind
  ``type`` (``https://schema.org/Product`` -> ``Product``, matching the
  bare types the JSON-LD channel emits);
* a tag with BOTH ``itemprop`` and ``itemscope`` is a nested entity: it
  emits ``(previous scope's subj, prop, its own subj)`` with kind
  ``entity`` — document-order parent, one level, the WDC flattening rule;
* ``itemprop`` may hold several space-separated names (HTML spec): each
  token emits its own triple;
* property values resolve in priority order: a non-empty ``content``
  attribute, else the tag-specific attribute (``href`` for a/link/area,
  ``src`` for img/audio/video/embed/iframe/source/track, ``datetime``
  for time, ``value`` for data/meter), else the trimmed text run up to
  the next ``<``. Empty values drop.

Scale design: three zipped ``regexp_extract_all`` passes build one
per-page tag array; scope assignment is a LINEAR ``F.aggregate`` fold
(never a window — no shuffle, no per-page quadratic slice); subjects use
``F.get`` so out-of-range lookups are NULL instead of ANSI errors. The
whole operator is a single narrow map: ZERO shuffles, zero Python UDFs
(plan-asserted in tests). Downstream claim fusion does the aggregation.

The flat-scope engine itself (:func:`scoped_attr_triples`) is channel
agnostic — ``operators/rdfa.py`` reuses it with RDFa Lite attribute
names (typeof/property/resource/about), so both attribute-embedded WDC
channels share one pinned execution shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one opening tag that carries itemscope or itemprop, plus its text run:
# (1) tag name, (2) full attribute string, (3) text up to the next '<'
# (?<![\w-]) instead of \b on the attribute names: \b holds after a
# hyphen, so plain \b would treat data-itemprop="x" / data-itemscope
# (common crawl-HTML custom attributes) as microdata markup
MD_TAG_RE = (
    r"(?is)<([a-z][a-z0-9]*)\b"
    r"([^<>]*(?<![\w-])item(?:scope|prop)\b[^<>]*)>([^<]*)"
)

_TRIPLE_T = "array<struct<subj:string,predicate:string,obj:string,kind:string>>"


def _attr(attrs: Column, name: str) -> Column:
    """Value of ``name="..."`` / ``name='...'`` in an attribute string
    ('' when absent — regexp_extract's no-match convention). The
    ``(?<![\\w-])`` guard keeps ``data-href``/``data-content``-style
    prefixed attributes from matching (``\\b`` would hold after ``-``)."""
    return F.regexp_extract(
        attrs, rf"(?i)(?<![\w-]){name}\s*=\s*[\"']([^\"']*)[\"']", 1
    )


def microdata_triples(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(url, tag_idx, scope_idx, subj, predicate, obj, kind)`` from
    every itemscope/itemprop tag; kind in {type, entity, literal}.

    ``scope_idx`` is the scope id of the EMITTING tag (for an ``entity``
    row that is the child scope; its ``subj`` is the parent's subject).
    """
    return scoped_attr_triples(
        pages, url_col=url_col, html_col=html_col,
        tag_re=MD_TAG_RE,
        scope_re=r"(?i)(?<![\w-])itemscope\b",
        subj_attrs=("itemid",),
        type_attr="itemtype",
        type_seg_re=r"([^/#]+)$",
        prop_attr="itemprop",
        blank_prefix="#md",
    )


def scoped_attr_triples(
    pages: DataFrame,
    *,
    url_col: str,
    html_col: str,
    tag_re: str,
    scope_re: str,
    subj_attrs: tuple[str, ...],
    type_attr: str,
    type_seg_re: str,
    prop_attr: str,
    blank_prefix: str,
) -> DataFrame:
    """Shared flat document-order scope engine for attribute-embedded
    structured data (microdata, RDFa Lite). ``tag_re`` must capture
    (tag name, attribute string, trailing text); ``scope_re`` marks
    scope-opening tags; subjects come from the first non-empty attr in
    ``subj_attrs`` else ``url<blank_prefix><scope_idx>``; the
    ``type_attr`` value is whitespace-split and each token reduced by
    ``type_seg_re`` into one rdf:type row.
    """
    import uuid

    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    # ONE heavy regex pass over the page (group 0: the full tag match);
    # per-tag fields re-derive from the SHORT match strings below. The
    # observe() nodes are CollectMetrics barriers (the parse_events
    # device, operators/graph.py:129-150): without them CollapseProject
    # re-inlines the alias chain and the page-sized regex scan runs once
    # per USE SITE — 9 full-html passes instead of 1 (measured 21s ->
    # ~3s on the sf0.1 gate corpus).
    uniq = uuid.uuid4().hex[:8]
    p1 = pages.select(
        F.col(url_col).alias("url"),
        F.regexp_extract_all(html, F.lit(tag_re), 0).alias("_raw"),
    ).observe(f"attr_scope_scan_{uniq}", F.count(F.lit(1)).alias("pages"))
    tags_expr = F.transform(
        F.col("_raw"),
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, tag_re, 1)).alias("nm"),
            F.regexp_extract(t, tag_re, 2).alias("at"),
            F.regexp_extract(t, tag_re, 3).alias("tx"),
        ),
    )
    p2 = p1.select("url", tags_expr.alias("_tags")).observe(
        f"attr_scope_tags_{uniq}", F.count(F.lit(1)).alias("pages")
    )
    tags = F.col("_tags")

    def is_scope(t: Column) -> Column:
        return t["at"].rlike(scope_re)

    # running scope id per tag: linear fold, -1 before the first itemscope
    sid_step = lambda acc, t: F.struct(  # noqa: E731
        (acc["cur"] + is_scope(t).cast("int")).alias("cur"),
        F.concat(
            acc["out"], F.array(acc["cur"] + is_scope(t).cast("int"))
        ).alias("out"),
    )
    sids = F.aggregate(
        tags,
        F.struct(
            F.lit(-1).alias("cur"), F.array().cast("array<int>").alias("out")
        ),
        sid_step,
        lambda acc: acc["out"],
    )
    # subject per scope, in scope order: first non-empty subject attr,
    # else the deterministic blank node url<blank_prefix><scope_idx>
    url_c = F.col("url")

    def scope_subj(t: Column, i: Column) -> Column:
        out = F.concat(url_c, F.lit(blank_prefix), i.cast("string"))
        for name in reversed(subj_attrs):
            out = F.when(_attr(t["at"], name) != "", _attr(t["at"], name)).otherwise(
                out
            )
        return out

    subs = F.transform(F.filter(tags, is_scope), scope_subj)

    x = p2.select(
        "url",
        subs.alias("subs"),
        F.posexplode(F.arrays_zip(tags.alias("t"), sids.alias("sid"))).alias(
            "tag_idx", "z"
        ),
    ).select(
        "url", "tag_idx", "subs",
        F.col("z.t.nm").alias("nm"), F.col("z.t.at").alias("at"),
        F.col("z.t.tx").alias("tx"), F.col("z.sid").alias("sid"),
    )

    at = F.col("at")
    scope = at.rlike(scope_re)
    self_subj = F.get("subs", F.col("sid"))
    parent_subj = F.get("subs", F.col("sid") - 1)
    tokens = F.filter(
        F.split(F.trim(_attr(at, prop_attr)), r"\s+"), lambda s: s != ""
    )
    # type attr may hold several whitespace-separated tokens (both specs
    # allow it); each reduces to its type_seg_re segment
    type_toks = F.filter(
        F.transform(
            F.split(F.trim(_attr(at, type_attr)), r"\s+"),
            lambda s: F.regexp_extract(s, type_seg_re, 1),
        ),
        lambda s: s != "",
    )

    nm = F.col("nm")
    content = _attr(at, "content")
    tag_attr = (
        F.when(nm.isin("a", "link", "area"), _attr(at, "href"))
        .when(
            nm.isin("img", "audio", "video", "embed", "iframe", "source", "track"),
            _attr(at, "src"),
        )
        .when(nm == "time", _attr(at, "datetime"))
        .when(nm.isin("data", "meter"), _attr(at, "value"))
        .otherwise(F.lit(""))
    )
    value = (
        F.when(content != "", content)
        .when(tag_attr != "", tag_attr)
        .otherwise(F.trim("tx"))
    )

    empty = F.array().cast(_TRIPLE_T)
    type_rows = F.when(
        scope & self_subj.isNotNull(),
        F.transform(
            type_toks,
            lambda seg: F.struct(
                self_subj.alias("subj"), F.lit("rdf:type").alias("predicate"),
                seg.alias("obj"), F.lit("type").alias("kind"),
            ),
        ),
    ).otherwise(empty)
    entity_rows = F.when(
        scope & parent_subj.isNotNull(),
        F.transform(
            tokens,
            lambda tok: F.struct(
                parent_subj.alias("subj"), tok.alias("predicate"),
                self_subj.alias("obj"), F.lit("entity").alias("kind"),
            ),
        ),
    ).otherwise(empty)
    literal_rows = F.when(
        ~scope & self_subj.isNotNull() & (value != ""),
        F.transform(
            tokens,
            lambda tok: F.struct(
                self_subj.alias("subj"), tok.alias("predicate"),
                value.alias("obj"), F.lit("literal").alias("kind"),
            ),
        ),
    ).otherwise(empty)

    return x.select(
        "url", "tag_idx", F.col("sid").alias("scope_idx"),
        F.explode(F.concat(type_rows, entity_rows, literal_rows)).alias("t"),
    ).select(
        "url", "tag_idx", "scope_idx",
        F.col("t.subj").alias("subj"), F.col("t.predicate").alias("predicate"),
        F.col("t.obj").alias("obj"), F.col("t.kind").alias("kind"),
    )
