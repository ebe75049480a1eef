"""schema.org structured-data -> KG triples (JSON-LD script blocks).

After sentences (``operators/triples.py``), tables (``htmltables.py``)
and Hearst patterns (``hearst.py``), the fourth major fact carrier on the
real web is EMBEDDED STRUCTURED DATA: ``<script type="application/
ld+json">`` blocks publishers emit for search engines (schema.org
Product/Article/Person/... markup). Production Common-Crawl KG pipelines
(e.g. the WDC structured-data extractions) mine exactly this channel, so
a webtext KG construction engine (BASELINE.json north_star) needs it as a
first-class extractor view next to the prose ones.

Everything is JVM-side Catalyst expressions — Jackson via ``from_json``,
never a Python UDF. The load-bearing Spark behavior (test-pinned): parsing
with ``map<string,string>`` / ``array<string>`` schemas RAW-CAPTURES any
nested subtree as its compact JSON text, so one pass splits an entity
into (key, raw value) pairs and a second ``from_json`` re-parses just the
nested values we keep. Malformed blocks parse to NULL and drop silently
(count them with the ``metrics`` dict), exactly like real crawl data.

Semantics (pinned by the ``jsonld_triples`` gate + tests):
* every ld+json script block gets a ``block_idx`` (document order;
  malformed blocks still consume an index);
* a block is a top-level object, a top-level ARRAY of entities, or an
  object wrapping an ``@graph`` array (the three shapes in the wild) —
  entities get ``elem_idx`` within the block;
* subject = the entity's ``@id`` if present, else ``url#ld<block>-<elem>``
  (a deterministic blank-node name keyed by position);
* ``@type`` emits ``(subj, rdf:type, type)`` with kind ``type``; other
  ``@``-keys are structural and emit nothing;
* scalar values emit literal triples (numbers/booleans in their JSON
  text form); ARRAY values emit one triple per element (multi-valued
  properties like ``sameAs``); OBJECT values emit an entity triple whose
  object is the nested ``name`` (else ``@id``) — one level of nesting,
  the WDC flattening convention. Nested objects with neither, and empty
  strings, emit nothing;
* non-object elements inside a top-level array are skipped.

Scale design: a single NARROW map per page — regex block split +
``posexplode`` + three bounded ``from_json`` passes; array fan-out is
bounded by block size. ZERO shuffles and zero UDFs in the whole operator
(plan-asserted in tests); downstream claim fusion does the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LD_SCRIPT_RE = (
    r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)

_ENTITY_SCHEMA = "map<string,string>"
_ARRAY_SCHEMA = "array<string>"
# nested-object projection: name preferred, @id fallback (WDC convention)
_NESTED_SCHEMA = "name string, `@id` string"


def jsonld_triples(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(url, block_idx, elem_idx, subj, predicate, obj, kind)`` from
    every ld+json block; kind in {type, literal, entity}."""
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(html, F.lit(LD_SCRIPT_RE), 1)).alias(
            "block_idx", "raw"
        ),
    )

    # ---- block -> entities ------------------------------------------------
    t = F.ltrim(F.col("raw"))
    obj_map = F.from_json("raw", _ENTITY_SCHEMA)
    graph_raw = obj_map.getItem("@graph")
    ents = (
        F.when(t.startswith("["), F.from_json("raw", _ARRAY_SCHEMA))
        .when(
            graph_raw.isNotNull() & F.ltrim(graph_raw).startswith("["),
            F.from_json(graph_raw, _ARRAY_SCHEMA),
        )
        .when(obj_map.isNotNull(), F.array("raw"))
    )
    e = blocks.select(
        "url", "block_idx", F.posexplode(ents).alias("elem_idx", "ent")
    )
    m = F.from_json("ent", _ENTITY_SCHEMA)
    e = e.select("url", "block_idx", "elem_idx", m.alias("m")).filter(
        F.col("m").isNotNull()
    )

    # ---- entity -> (key, raw value) ---------------------------------------
    subj = F.coalesce(
        F.col("m").getItem("@id"),
        F.concat(
            F.col("url"), F.lit("#ld"),
            F.col("block_idx").cast("string"), F.lit("-"),
            F.col("elem_idx").cast("string"),
        ),
    )
    kv = e.select(
        "url", "block_idx", "elem_idx", subj.alias("subj"),
        F.explode("m").alias("k", "v"),
    ).filter((~F.col("k").startswith("@")) | (F.col("k") == "@type"))

    # ---- value -> objects (arrays fan out, one level of nesting) ----------
    vt = F.ltrim(F.col("v"))
    items = F.when(vt.startswith("["), F.from_json("v", _ARRAY_SCHEMA)).otherwise(
        F.array("v")
    )
    x = kv.select(
        "url", "block_idx", "elem_idx", "subj",
        F.when(F.col("k") == "@type", F.lit("rdf:type"))
        .otherwise(F.col("k"))
        .alias("predicate"),
        (F.col("k") == "@type").alias("is_type"),
        F.explode(items).alias("item"),
    )
    it = F.ltrim(F.col("item"))
    nested = F.from_json("item", _NESTED_SCHEMA)
    obj = F.when(
        it.startswith("{"), F.coalesce(nested["name"], nested["@id"])
    ).otherwise(F.col("item"))
    kind = (
        F.when(F.col("is_type"), F.lit("type"))
        .when(it.startswith("{"), F.lit("entity"))
        .otherwise(F.lit("literal"))
    )
    return (
        x.select(
            "url", "block_idx", "elem_idx", "subj", "predicate",
            obj.alias("obj"), kind.alias("kind"),
        )
        .filter(F.col("obj").isNotNull() & (F.col("obj") != ""))
    )


# --- meta / OpenGraph tags --------------------------------------------------

META_RE = (
    r"(?is)<meta\s+(?:property|name)\s*=\s*[\"']([^\"']+)[\"']\s+"
    r"content\s*=\s*[\"']([^\"']*)[\"'][^>]*>"
)


def meta_triples(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    prefixes: tuple[str, ...] = ("og:", "article:", "twitter:", "description"),
) -> DataFrame:
    """Page-level metadata triples from ``<meta property=...>`` /
    ``<meta name=...>`` tags — the OpenGraph channel (og:title, og:type,
    article:author, ...). Subject is the page url itself. Only tags whose
    property/name starts with one of ``prefixes`` are kept (the generic
    viewport/charset noise is not KG signal). Empty content drops.

    Same scale shape as :func:`jsonld_triples`: one narrow map, two
    zipped ``regexp_extract_all`` passes, zero shuffle, zero UDF.
    """
    src = pages.schema[html_col].dataType.typeName()
    html = (
        F.decode(F.col(html_col), "UTF-8") if src == "binary" else F.col(html_col)
    )
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(META_RE), 1).alias("p"),
        F.regexp_extract_all(html, F.lit(META_RE), 2).alias("c"),
    )
    x = pages.select(
        F.col(url_col).alias("url"), F.posexplode(pairs).alias("meta_idx", "kv")
    ).select(
        "url", "meta_idx",
        F.col("kv.p").alias("predicate"), F.col("kv.c").alias("obj"),
    )
    keep = None
    for pre in prefixes:
        c = F.col("predicate").startswith(pre)
        keep = c if keep is None else (keep | c)
    return x.filter(keep & (F.col("obj") != ""))
