"""Abbreviation pair extraction: ``Long Form (LF)`` alias mining.

Webtext introduces entities with a parenthesized short form — "the
Advanced Persistent Threat (APT) group", "Department of Defense (DOD)"
— and a KG builder mines these as ALIAS edges feeding entity
canonicalization (the same role `extract_canonical_aliases` plays for
urls, here for names). The classic reference is Schwartz & Hearst
(PSB 2003); this operator pins a word-initial subset of it:

* candidate = 2-7 word run immediately followed by ``(ABBR)`` with
  ABBR 2-10 uppercase letters; the run starts at a capitalized token
  and may interleave the lowercase connectors of/and/the/for/in/on;
* EVERY word contributes its first letter, case-insensitively — so
  "Department of Defense" reads DOD (the connector supplies the O);
* the long form LEFT-TRIMS to the abbreviation's length: with
  ``k = len(ABBR)`` the LAST k words must spell ABBR, and the emitted
  ``long`` is exactly those k words ("The Advanced Persistent Threat
  (APT)" emits "Advanced Persistent Threat" — the sentence-leading
  "The" trims away). Candidates with fewer than k words, or whose last
  k initials mismatch, DROP but still consume their ``pair_idx``
  (document-order numbering over candidates). The Schwartz-Hearst
  character-subsequence alignment (ABBRs drawing mid-word letters) is
  deliberately not implemented;
* duplicates on one page keep every occurrence (frequency is signal
  for downstream alias voting).

Scale design: one ``regexp_extract_all`` (two zipped group passes) +
``posexplode`` + higher-order-function slice/initials checks — a
single narrow map, zero shuffle, zero UDF (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONN = "(?:of|and|the|for|in|on)"
_WORD = r"[A-Z][A-Za-z0-9-]*"

ABBREV_RE = (
    rf"\b({_WORD}(?:[ ](?:{_CONN}[ ])?{_WORD}){{1,6}})\s*\(([A-Z]{{2,10}})\)"
)


def abbrev_pairs(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Docs -> ``(url, pair_idx, long, short)`` verified initialisms;
    ``long`` is the left-trimmed k-word form spelling ``short``."""
    from sigraph_spark.functions.hof import zip_match_groups

    text = F.col(text_col)
    # one group-0 scan + per-match group pulls (was one full-text pass
    # per capture group)
    cands = zip_match_groups(text, ABBREV_RE, ["lf", "sf"])
    x = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(cands).alias("pair_idx", "c"),
    ).select(
        "url", "pair_idx",
        F.split(F.col("c.lf"), " ").alias("_words"),
        F.col("c.sf").alias("short"),
    )
    k = F.length("short")
    tail = F.slice("_words", -k, k)
    initials = F.upper(
        F.array_join(F.transform(tail, lambda w: F.substring(w, 1, 1)), "")
    )
    return (
        x.filter((F.size("_words") >= k) & (initials == F.col("short")))
        .select(
            "url", "pair_idx",
            F.array_join(tail, " ").alias("long"), "short",
        )
    )


def alias_map(
    pairs: DataFrame, min_pages: int = 2
) -> DataFrame:
    """Mined pairs -> one ``(short, long, n_pages)`` winner per short
    form: corpus-voted (distinct supporting pages), ties broken by MORE
    pages then lexicographic long — deterministic on any partitioning.
    Shorts below ``min_pages`` distinct pages drop (one-off coinages
    are noise). The output is SOURCE-side small (bounded by the
    abbreviation vocabulary), built for a broadcast join in
    :func:`apply_aliases`."""
    from pyspark.sql import Window

    votes = (
        pairs.groupBy("short", "long")
        .agg(F.count_distinct("url").alias("n_pages"))
        .filter(F.col("n_pages") >= min_pages)
    )
    # winner per short form via algebraic min-struct (max pages, ties to
    # lexicographically smallest expansion) — map-side partial agg
    # instead of a ranking window; (n_pages, long) is unique per group
    # so the trailing payload field cannot influence the min
    return (
        votes.groupBy("short")
        .agg(F.min(F.struct(
            (-F.col("n_pages")).alias("_np"),
            F.col("long").alias("_l"),
            F.col("n_pages").alias("_n"),
        )).alias("_w"))
        .select(
            "short",
            F.col("_w._l").alias("long"),
            F.col("_w._n").alias("n_pages"),
        )
    )


def apply_aliases(
    df: DataFrame, amap: DataFrame, col: str = "subject"
) -> DataFrame:
    """Replace short-form values of ``col`` with their voted long form
    (rows without an alias pass through). One BROADCAST left join —
    the map is vocabulary-sized by construction."""
    ren = amap.select(
        F.col("short").alias("_ab_s"), F.col("long").alias("_ab_l")
    )
    return (
        df.join(F.broadcast(ren), df[col] == F.col("_ab_s"), "left")
        .withColumn(col, F.coalesce(F.col("_ab_l"), F.col(col)))
        .drop("_ab_s", "_ab_l")
    )
