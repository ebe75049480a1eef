"""RDF N-Triples export / import for the KG edge table.

The reference keeps its graph captive in Neo4j (src/db/client.py) — the
only export is the JSON provenance envelope (app/backend). A KG
construction pipeline at web scale needs the lingua-franca interchange
format instead: W3C N-Triples, one independent UTF-8 line per triple, the
format every triple store and KG toolchain ingests and the one format that
needs *zero* coordination to write from ten thousand tasks.

Layout emitted per edge row (src, predicate, dst, start_time, weight):

    <base>node/S   <base>rel/P        <base>node/O                     .
    <base>edge/S/P/O <base>prop/weight    "W"^^xsd:long                .
    <base>edge/S/P/O <base>prop/startTime "ISO"^^xsd:dateTime          .

``edge/S/P/O`` is the statement IRI (each component percent-encoded, so
the identity is injective); the property lines carry the edge attributes
the bare triple can't.

100 TB design: export is a pure narrow map — three JVM-side concat/replace
projections and a union, zero shuffle, append-only text sink (each task
writes its own shard; N-Triples is line-delimited so shards concatenate).
Import is a narrow regex parse plus ONE hash join keyed on the statement
IRI to re-assemble attributes; escaping/unescaping is a fixed chain of
``F.replace`` calls that stays inside whole-stage codegen (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

# N-Triples IRIs cannot contain these raw (plus '%' which starts an escape
# and '/' which we reserve as the statement-IRI component separator).
# Order matters: '%' must encode first and decode last.
_IRI_ENC = [
    ("%", "%25"), ("/", "%2F"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
    ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"), ("^", "%5E"),
    ("`", "%60"), ("\\", "%5C"), ("\n", "%0A"), ("\r", "%0D"), ("\t", "%09"),
]

# N-Triples literal escapes (backslash first on encode, last on decode).
_LIT_ENC = [
    ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
]

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _chain(col: Column, pairs: list[tuple[str, str]]) -> Column:
    for old, new in pairs:
        col = F.replace(col, F.lit(old), F.lit(new))
    return col


def iri_encode(col: Column) -> Column:
    return _chain(col, _IRI_ENC)


def iri_decode(col: Column) -> Column:
    return _chain(col, [(b, a) for a, b in reversed(_IRI_ENC)])


def literal_escape(col: Column) -> Column:
    return _chain(col, _LIT_ENC)


def literal_unescape(col: Column) -> Column:
    return _chain(col, [(b, a) for a, b in reversed(_LIT_ENC)])


def _stmt_iri(base: str) -> Column:
    return F.concat(
        F.lit(base + "edge/"), iri_encode(F.col("src")),
        F.lit("/"), iri_encode(F.col("predicate")),
        F.lit("/"), iri_encode(F.col("dst")),
    )


def to_ntriples(edges: DataFrame, base: str = "http://kg.local/") -> DataFrame:
    """Edge table -> one-column DataFrame ``line`` of N-Triples lines."""
    node = lambda c: F.concat(F.lit("<" + base + "node/"), iri_encode(F.col(c)), F.lit(">"))  # noqa: E731
    stmt = F.concat(F.lit("<"), _stmt_iri(base), F.lit(">"))
    rel = edges.select(
        F.concat(
            node("src"),
            F.lit(" <" + base + "rel/"), iri_encode(F.col("predicate")), F.lit("> "),
            node("dst"), F.lit(" ."),
        ).alias("line")
    )
    weight = edges.select(
        F.concat(
            stmt, F.lit(" <" + base + "prop/weight> \""),
            literal_escape(F.col("weight").cast("string")),
            F.lit('"^^<' + XSD + "long> ."),
        ).alias("line")
    )
    ts = edges.select(
        F.concat(
            stmt, F.lit(" <" + base + "prop/startTime> \""),
            F.date_format("start_time", _TS_FMT),
            F.lit('"^^<' + XSD + "dateTime> ."),
        ).alias("line")
    )
    return rel.unionAll(weight).unionAll(ts)


def to_ntriples_star(edges: DataFrame,
                     base: str = "http://kg.local/") -> DataFrame:
    """RDF-star export (W3C RDF 1.2 quoted triples — the modern form
    of the statement-IRI reification :func:`to_ntriples` uses): the
    asserted triple plus annotation lines whose SUBJECT is the quoted
    triple itself::

        <node/S> <rel/P> <node/O> .
        << <node/S> <rel/P> <node/O> >> <prop/weight> "W"^^xsd:long .
        << ... >> <prop/startTime> "ISO"^^xsd:dateTime .

    Same scale shape as the plain export: three narrow projections +
    union, zero shuffle, line-delimited shards."""
    node = lambda c: F.concat(F.lit("<" + base + "node/"), iri_encode(F.col(c)), F.lit(">"))  # noqa: E731
    bare = F.concat(
        node("src"),
        F.lit(" <" + base + "rel/"), iri_encode(F.col("predicate")),
        F.lit("> "), node("dst"),
    )
    quoted = F.concat(F.lit("<< "), bare, F.lit(" >>"))
    rel = edges.select(F.concat(bare, F.lit(" .")).alias("line"))
    weight = edges.select(
        F.concat(
            quoted, F.lit(" <" + base + "prop/weight> \""),
            literal_escape(F.col("weight").cast("string")),
            F.lit('"^^<' + XSD + "long> ."),
        ).alias("line")
    )
    ts = edges.select(
        F.concat(
            quoted, F.lit(" <" + base + "prop/startTime> \""),
            F.date_format("start_time", _TS_FMT),
            F.lit('"^^<' + XSD + "dateTime> ."),
        ).alias("line")
    )
    return rel.unionAll(weight).unionAll(ts)


# RDF-star annotation line: << <s> <p> <o> >> <pred> "lit"^^<dtype> .
_STAR_RE = (r'^<< <([^>]*)> <([^>]*)> <([^>]*)> >> '
            r'<([^>]*)> "(.*)"\^\^<([^>]*)> \.$')


def edges_from_ntriples_star(
    lines: DataFrame, base: str = "http://kg.local/"
) -> DataFrame:
    """Round-trip inverse of :func:`to_ntriples_star`: asserted lines
    give (src, predicate, dst); annotation lines join back on the
    quoted-triple key (the three decoded terms — no statement IRI
    needed, which is the point of RDF-star)."""
    c = F.col("line")
    strip = lambda x, prefix: iri_decode(F.substring(x, len(prefix) + 1, 1 << 20))  # noqa: E731

    asserted = lines.filter(~c.startswith("<<")).select(
        strip(F.regexp_extract(c, _LINE_RE, 1), base + "node/").alias("src"),
        strip(F.regexp_extract(c, _LINE_RE, 2), base + "rel/")
        .alias("predicate"),
        strip(F.regexp_extract(c, _LINE_RE, 3), base + "node/").alias("dst"),
    ).filter(F.col("src") != "")

    ann = lines.filter(c.startswith("<<")).select(
        strip(F.regexp_extract(c, _STAR_RE, 1), base + "node/").alias("src"),
        strip(F.regexp_extract(c, _STAR_RE, 2), base + "rel/")
        .alias("predicate"),
        strip(F.regexp_extract(c, _STAR_RE, 3), base + "node/").alias("dst"),
        F.substring(F.regexp_extract(c, _STAR_RE, 4),
                    len(base + "prop/") + 1, 1 << 20).alias("_prop"),
        literal_unescape(F.regexp_extract(c, _STAR_RE, 5)).alias("_val"),
    )
    attrs = ann.groupBy("src", "predicate", "dst").pivot(
        "_prop", ["weight", "startTime"]).agg(F.first("_val"))
    return asserted.join(attrs, ["src", "predicate", "dst"]).select(
        "src", "predicate", "dst",
        F.to_timestamp("startTime", _TS_FMT).alias("start_time"),
        F.col("weight").cast("long").alias("weight"),
    )


# one N-Triples line: <subj> <pred> (<obj-iri> | "literal"^^<dtype>) .
_LINE_RE = r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"(.*)"\^\^<([^>]*)>) \.$'


def parse_ntriples(lines: DataFrame, col: str = "line") -> DataFrame:
    """Parse N-Triples lines -> (subj, pred, obj_iri, obj_literal, obj_datatype).

    Resource objects land in ``obj_iri`` (others NULL); typed literals land
    in ``obj_literal``/``obj_datatype``. Malformed lines (no regex match)
    surface as all-NULL term rows — filter on ``subj IS NULL`` for an error
    channel rather than silently dropping.
    """
    c = F.col(col)
    empty_null = lambda x: F.when(x == "", None).otherwise(x)  # noqa: E731
    return lines.select(
        empty_null(F.regexp_extract(c, _LINE_RE, 1)).alias("subj"),
        empty_null(F.regexp_extract(c, _LINE_RE, 2)).alias("pred"),
        empty_null(F.regexp_extract(c, _LINE_RE, 3)).alias("obj_iri"),
        F.when(
            F.regexp_extract(c, _LINE_RE, 5) == "", None
        ).otherwise(literal_unescape(F.regexp_extract(c, _LINE_RE, 4))).alias("obj_literal"),
        empty_null(F.regexp_extract(c, _LINE_RE, 5)).alias("obj_datatype"),
    )


def edges_from_ntriples(
    lines: DataFrame, base: str = "http://kg.local/"
) -> DataFrame:
    """Re-assemble the edge table from its N-Triples export (round-trip
    inverse of :func:`to_ntriples`): relation lines give (src, predicate,
    dst); attribute lines join back on the statement IRI."""
    parsed = parse_ntriples(lines)
    strip = lambda c, prefix: iri_decode(F.substring(c, len(prefix) + 1, 1 << 20))  # noqa: E731

    rels = parsed.filter(
        F.col("pred").startswith(base + "rel/") & F.col("obj_iri").isNotNull()
    ).select(
        strip(F.col("subj"), base + "node/").alias("src"),
        strip(F.col("pred"), base + "rel/").alias("predicate"),
        strip(F.col("obj_iri"), base + "node/").alias("dst"),
        F.col("subj").alias("_s"),
    )
    # recompute the statement IRI from the decoded terms (pure projection)
    rels = rels.withColumn("_stmt", _stmt_iri(base)).drop("_s")

    props = parsed.filter(F.col("pred").startswith(base + "prop/")).select(
        F.col("subj").alias("_stmt"),
        F.substring(F.col("pred"), len(base + "prop/") + 1, 1 << 20).alias("_prop"),
        "obj_literal",
    )
    attrs = props.groupBy("_stmt").pivot(
        "_prop", ["weight", "startTime"]
    ).agg(F.first("obj_literal"))

    return rels.join(attrs, "_stmt").select(
        "src", "predicate", "dst",
        F.to_timestamp("startTime", _TS_FMT).alias("start_time"),
        F.col("weight").cast("long").alias("weight"),
    )
