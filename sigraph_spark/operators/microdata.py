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


_ROW_T = (
    "array<struct<tag_idx:int,scope_idx:int,"
    "subj:string,predicate:string,obj:string,kind:string>>"
)


def scoped_attr_kernel(
    url: Column,
    html: Column,
    *,
    tag_re: str,
    scope_re: str,
    subj_attrs: tuple[str, ...],
    type_attr: str,
    type_seg_re: str,
    prop_attr: str,
    blank_prefix: str,
) -> Column:
    """Shared flat document-order scope engine for attribute-embedded
    structured data (microdata, RDFa Lite) as a single-pass COLUMN
    KERNEL: html -> ``array<struct<tag_idx, scope_idx, subj, predicate,
    obj, kind>>``. ``tag_re`` must capture (tag name, attribute string,
    trailing text); ``scope_re`` marks scope-opening tags; subjects come
    from the first non-empty attr in ``subj_attrs`` else
    ``url<blank_prefix><scope_idx>``; the ``type_attr`` value is
    whitespace-split and each token reduced by ``type_seg_re`` into one
    rdf:type row.

    The ONE heavy regex pass over the page (group 0: the full tag
    match) and every derived array are ``hof.let``-bound so each is
    evaluated exactly once — the kernel-world equivalent of the
    observe() CollapseProject barriers the projection-chain form of
    this engine used to need (without binding, Catalyst inlines the
    alias chain and the page-sized scan runs once per use site —
    measured 9x / 21s -> ~3s on the sf0.1 gate corpus). Being a pure
    Column expression, the kernel composes into the fused one-scan
    extraction pass (``operators/fusedscan.py``).
    """
    from sigraph_spark.functions.hof import let

    empty = F.array().cast(_ROW_T)

    def nz(c: Column) -> Column:
        # NULL-if-empty with a SINGLE evaluation of c (a when/otherwise
        # pair would re-run the attr regex on both references)
        return let(c, lambda v: F.when(v != "", v))

    def enrich(t: Column) -> Column:
        # ONE evaluation per derived field: the group extracts and every
        # attribute pull land in a single per-tag struct, so the scope
        # fold and row builders below touch only cheap bound fields.
        # Without this, when()-chains and twice-referenced lambda columns
        # re-run the attr regexes ~4x per tag — measured as ~2x the whole
        # channel's executor CPU on the sf0.1 bench corpus.
        def build(at: Column, nm: Column) -> Column:
            tag_attr = (
                F.when(nm.isin("a", "link", "area"), _attr(at, "href"))
                .when(
                    nm.isin(
                        "img", "audio", "video", "embed", "iframe",
                        "source", "track",
                    ),
                    _attr(at, "src"),
                )
                .when(nm == "time", _attr(at, "datetime"))
                .when(nm.isin("data", "meter"), _attr(at, "value"))
                .otherwise(F.lit(""))
            )
            return F.struct(
                at.rlike(scope_re).alias("sc"),
                # first non-empty subject attr (tuple order), NULL if none
                F.coalesce(
                    *[nz(_attr(at, n)) for n in subj_attrs],
                    F.lit(None).cast("string"),
                ).alias("sv"),
                F.trim(_attr(at, prop_attr)).alias("prop"),
                F.trim(_attr(at, type_attr)).alias("typ"),
                # value precedence: content attr > tag-specific attr >
                # trailing text run. The text run is everything after
                # the FIRST '>' of the matched tag (the attr run cannot
                # contain <>, and the match already stops at the next
                # '<') — a substring, not a third full-pattern re-match
                F.coalesce(
                    nz(_attr(at, "content")), nz(tag_attr),
                    F.trim(
                        F.substring(t, F.instr(t, ">") + 1, F.length(t))
                    ),
                ).alias("val"),
            )

        # group pulls via cheap ANCHORED patterns instead of re-running
        # the full tag_re (alternation + lookbehind) against each tag
        # string: the match always starts '<name' and its first '>'
        # closes the attr run, so these extract the IDENTICAL groups —
        # measured ~2/3 of each scoped channel's kernel CPU
        return let(
            F.regexp_extract(t, r"(?s)^<[a-zA-Z][a-zA-Z0-9]*([^<>]*)>", 1),
            lambda at: let(
                F.lower(F.regexp_extract(t, r"^<([a-zA-Z][a-zA-Z0-9]*)", 1)),
                lambda nm: build(at, nm),
            ),
        )

    def sids_of(tags: Column) -> Column:
        # running scope id per tag: linear fold, -1 before the first scope
        return F.aggregate(
            tags,
            F.struct(
                F.lit(-1).alias("cur"), F.array().cast("array<int>").alias("out")
            ),
            lambda acc, t: F.struct(
                (acc["cur"] + t["sc"].cast("int")).alias("cur"),
                F.concat(
                    acc["out"], F.array(acc["cur"] + t["sc"].cast("int"))
                ).alias("out"),
            ),
            lambda acc: acc["out"],
        )

    def rows_of(tags: Column, sids: Column, subs: Column) -> Column:
        def per_tag(t: Column, i: Column) -> Column:
            sid = F.get(sids, i)
            scope = t["sc"]
            self_subj = F.get(subs, sid)
            parent_subj = F.get(subs, sid - 1)
            tokens = F.filter(F.split(t["prop"], r"\s+"), lambda s: s != "")
            # type attr may hold several whitespace-separated tokens
            # (both specs allow it); each reduces to its segment
            type_toks = F.filter(
                F.transform(
                    F.split(t["typ"], r"\s+"),
                    lambda s: F.regexp_extract(s, type_seg_re, 1),
                ),
                lambda s: s != "",
            )
            value = t["val"]

            def mk(subj, pred, obj, kind: str) -> Column:
                return F.struct(
                    i.alias("tag_idx"), sid.alias("scope_idx"),
                    subj.alias("subj"), pred.alias("predicate"),
                    obj.alias("obj"), F.lit(kind).alias("kind"),
                )

            type_rows = F.when(
                scope & self_subj.isNotNull(),
                F.transform(
                    type_toks,
                    lambda seg: mk(self_subj, F.lit("rdf:type"), seg, "type"),
                ),
            ).otherwise(empty)
            entity_rows = F.when(
                scope & parent_subj.isNotNull(),
                F.transform(
                    tokens,
                    lambda tok: mk(parent_subj, tok, self_subj, "entity"),
                ),
            ).otherwise(empty)
            literal_rows = F.when(
                ~scope & self_subj.isNotNull() & (value != ""),
                F.transform(
                    tokens, lambda tok: mk(self_subj, tok, value, "literal")
                ),
            ).otherwise(empty)
            return F.concat(type_rows, entity_rows, literal_rows)

        return F.flatten(F.transform(tags, per_tag))

    kernel = let(
        F.regexp_extract_all(html, F.lit(tag_re), 0),
        lambda raw: let(
            F.transform(raw, enrich),
            lambda tags: let(
                sids_of(tags),
                lambda sids: let(
                    F.transform(
                        F.filter(tags, lambda t: t["sc"]),
                        lambda t, i: F.coalesce(
                            t["sv"],
                            F.concat(url, F.lit(blank_prefix), i.cast("string")),
                        ),
                    ),
                    lambda subs: rows_of(tags, sids, subs),
                ),
            ),
        ),
    )
    return F.coalesce(kernel, empty)


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
    """DataFrame form of :func:`scoped_attr_kernel`: one narrow map,
    ``explode`` of the per-page kernel array. Zero shuffles, zero UDFs
    (plan-asserted in tests)."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    k = scoped_attr_kernel(
        F.col(url_col), html,
        tag_re=tag_re, scope_re=scope_re, subj_attrs=subj_attrs,
        type_attr=type_attr, type_seg_re=type_seg_re,
        prop_attr=prop_attr, blank_prefix=blank_prefix,
    )
    # two selects: aliasing url in the SAME projection that references
    # it inside the kernel trips Spark's lateral-column-alias resolution
    return pages.select(
        F.col(url_col), F.explode(k).alias("t")
    ).select(
        F.col(url_col).alias("url"),
        F.col("t.tag_idx").alias("tag_idx"),
        F.col("t.scope_idx").alias("scope_idx"),
        F.col("t.subj").alias("subj"), F.col("t.predicate").alias("predicate"),
        F.col("t.obj").alias("obj"), F.col("t.kind").alias("kind"),
    )
