"""Typed-literal extraction & canonicalization over triple objects.

OpenIE objects are PHRASES ("to 185.220.101.45:443 every 60 seconds",
"C:\\tmp\\mod.dll,EntryPoint silently") — a KG wants the typed literal
inside the phrase, canonicalized, as a dictionary table keyed by
(type, canonical) with exact usage counts. The reference keeps raw
artifact strings and classifies them downstream per query
(/root/reference/src/graph/schema.py artifact labels); here typing is a
corpus-level build step so every consumer (IoC matching, blocklists,
entity linking priors) shares one dictionary.

Every pattern is written in the regex subset Java (Spark) and RE2
(DuckDB) evaluate identically — character classes, anchors, bounded
quantifiers, alternation; no backreferences or lookaround — so the gate
is hard-oracled.

Scale: tokenize (narrow map, fan-out bounded by object-phrase length) ->
one CASE classification pass -> one algebraic agg on (type, canonical).
No joins, no Python; the dictionary output is vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (type, pattern) in PRIORITY order — first match wins. Anchored full-token
# patterns; tokens are split on whitespace + commas.
LITERAL_PATTERNS: list[tuple[str, str]] = [
    ("url", r"^(https?|ftp)://[^\s]+$"),
    ("registry", r"^(hklm|hkcu|hkey_[a-z_]+)\\.*$"),
    ("winpath", r"^[a-z]:\\.*$"),
    ("unc", r"^\\\\[^\s\\]+\\.*$"),
    ("cve", r"^cve-[0-9]{4}-[0-9]+$"),
    ("sha256", r"^[0-9a-f]{64}$"),
    ("ipv4", r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}(:[0-9]+)?$"),
    # file BEFORE domain: a bare binary name (powershell.exe) is
    # domain-shaped, but a known executable extension wins
    ("file", r"^[a-z0-9_.-]+\.(exe|dll|bin|dat|zip|gz|job|dit|php|ps1|bat)$"),
    ("domain", r"^[a-z0-9]([a-z0-9-]*[a-z0-9])?(\.[a-z0-9]([a-z0-9-]*[a-z0-9])?)+\.?$"),
]

_TOKEN_SPLIT = r"[\s,]+"


def classify_literal(token: Column) -> Column:
    """Type of a canonical (lowered, re-fanged) token, NULL if untyped.
    One CASE chain in priority order — pure Column, codegen-friendly."""
    out = F.lit(None).cast("string")
    for littype, pat in reversed(LITERAL_PATTERNS):
        out = F.when(token.rlike(pat), F.lit(littype)).otherwise(out)
    return out


def canonical_token(token: Column) -> Column:
    """Canonical form: lowercase + re-fang ``[.]`` -> ``.`` (defanged
    IoCs unify with their live spelling, same rule as
    ``linking.normalize_entity``)."""
    return F.replace(F.lower(token), F.lit("[.]"), F.lit("."))


def object_literal_type(obj: Column) -> Column:
    """The type of an object PHRASE: the leftmost typed token's class
    ('untyped' when no token classifies). Higher-order functions keep it
    one JVM expression — transform(canonicalize+classify) then the first
    non-null — no explode, no shuffle."""
    types = F.transform(
        F.split(obj, _TOKEN_SPLIT),
        lambda t: classify_literal(canonical_token(t)),
    )
    first = F.filter(types, lambda x: x.isNotNull())
    # F.get is NULL-safe out of bounds (element_at RAISES under ANSI mode)
    return F.coalesce(F.get(first, 0), F.lit("untyped"))


def predicate_ranges(
    triples: DataFrame,
    pred_col: str = "verb",
    obj_col: str = "object",
) -> DataFrame:
    """Range induction — the typed-schema half the ontology quartet
    leaves open: for each predicate, the modal object literal type
    (``exfiltrate -> domain``, ``create -> winpath``; deterministic
    lexicographic ties) plus the exact per-type distribution counts a
    schema curator audits. One narrow type map + two algebraic aggs +
    a top-1 window keyed by the predicate (vocabulary-sized)."""
    typed = triples.select(
        F.col(pred_col).alias("predicate"),
        object_literal_type(F.col(obj_col)).alias("littype"),
    )
    counts = typed.groupBy("predicate", "littype").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("predicate").orderBy(F.desc("n"), F.asc("littype"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .groupBy("predicate")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("littype"))).alias("range_type"),
            F.sum("n").alias("n_objects"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
    )


def range_violations(
    triples: DataFrame,
    pred_col: str = "verb",
    obj_col: str = "object",
    min_share_pct: int = 80,
) -> DataFrame:
    """SHACL-style shape validation against the INDUCED schema: triples
    whose object literal type disagrees with the predicate's dominant
    range. A predicate constrains its range only when one type holds at
    least ``min_share_pct`` of its objects (integer gate ``100*n_modal >=
    pct*n_total``) and that type is not 'untyped' — low-consensus or
    untyped predicates assert nothing. Output one row per violating
    (predicate, object) with the expected/actual types and exact counts.

    Scale: the constraint table is vocabulary-sized and broadcast; the
    corpus pays one narrow type map + one hash join — no extra shuffle.
    """
    typed = triples.select(
        F.col(pred_col).alias("predicate"),
        F.col(obj_col).alias("object"),
        object_literal_type(F.col(obj_col)).alias("littype"),
    )
    counts = typed.groupBy("predicate", "littype").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("predicate").orderBy(F.desc("n"), F.asc("littype"))
    constraints = (
        counts.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_tot", F.sum("n").over(Window.partitionBy("predicate"))
        )
        .filter(
            (F.col("_rn") == 1)
            & (F.col("littype") != "untyped")
            & (100 * F.col("n") >= min_share_pct * F.col("_tot"))
        )
        .select("predicate", F.col("littype").alias("expected_type"))
    )
    return (
        typed.join(F.broadcast(constraints), "predicate")
        .filter(F.col("littype") != F.col("expected_type"))
        .groupBy(
            "predicate", "expected_type",
            F.col("littype").alias("actual_type"), "object",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )


def typed_literals(
    triples: DataFrame,
    obj_col: str = "object",
    doc_col: str = "url",
) -> DataFrame:
    """The typed-literal dictionary: one row per (littype, canonical)
    with exact mention and document counts. IPv4 literals additionally
    strip a ``:port`` suffix in the canonical (the endpoint identity is
    the address; the port stays visible in the raw mentions)."""
    toks = triples.select(
        F.col(doc_col).alias("_doc"),
        F.explode(F.split(F.col(obj_col), _TOKEN_SPLIT)).alias("_t"),
    ).filter(F.col("_t") != "")
    canon = toks.select(
        "_doc", canonical_token(F.col("_t")).alias("_c")
    ).withColumn("littype", classify_literal(F.col("_c")))
    typed = canon.filter(F.col("littype").isNotNull()).select(
        "_doc",
        "littype",
        F.when(
            (F.col("littype") == "ipv4") & F.col("_c").contains(":"),
            F.substring_index("_c", ":", 1),
        )
        .otherwise(F.col("_c"))
        .alias("canonical"),
    )
    return typed.groupBy("littype", "canonical").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("_doc").alias("n_docs"),
    )
