"""Hearst-pattern IS-A extraction and taxonomy induction.

The type hierarchy a webtext KG needs (``animal`` -> ``dog``) is latent in
lexico-syntactic patterns — "X such as Y", "Y and other X" (Hearst,
COLING'92). This module extracts those (hyponym, hypernym) pairs with pure
regex projections and induces taxonomy edges by corpus-level voting; it is
the type-level counterpart of the instance-level extractors
(``operators/triples.py`` sentences, ``operators/htmltables.py`` tables)
and feeds the same fusion/ontology layer (``operators/fusion.py``).

Pattern inventory (all over lowercased text; NP = 1-2 lowercase words,
lists = comma/and/or coordinated NPs):

    such_as     NP such as LIST            hyper=NP, hypos=LIST
    such_np_as  such NP as LIST            hyper=NP, hypos=LIST
    including   NP, including LIST         hyper=NP, hypos=LIST
    especially  NP, especially LIST        hyper=NP, hypos=LIST
    and_other   LIST and other NP          hypos=LIST, hyper=NP
    or_other    LIST or other NP           hypos=LIST, hyper=NP

Scale design: extraction is a NARROW map (``regexp_extract_all`` over the
text + bounded explodes — match arrays live within one document); the only
shuffle is the algebraic (hypo, hyper) count, whose map-side partial agg
absorbs Zipfian pattern heads. Taxonomy induction adds one self-join on the
REDUCED pair table (bounded by type vocabulary, not corpus size) to settle
reciprocal directions. Zero UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# an NP word is any lowercase token EXCEPT closed-class words — without
# the guard a 2-word NP eats "cats and" (truncating the list capture) or
# the verb after the list ("saws were"). Working over raw text instead of
# POS-chunked NPs, a closed-class stoplist is the standard approximation
# (coordinators, copulas/auxiliaries, determiners, prepositions).
_STOP = (
    "and|or|is|are|was|were|be|been|being|has|have|had|do|does|did|will|"
    "would|can|could|may|might|shall|should|must|the|a|an|this|that|these|"
    "those|of|in|on|at|to|for|with|by|from|as|other|such|including|"
    "especially|it|its|they|them"
)
# (?=[a-z]) first: the stoplist lookahead is a ~60-way alternation paid
# at EVERY scan position; the one-char lookahead fails the (majority)
# non-letter positions before it runs. [a-z]++ possessive: every
# continuation after a token run starts with a non-letter (space, comma,
# pattern end), so a backtracked shorter run always faces a letter next
# and fails — giving the positions back is provably useless work. Both
# rewrites are match-for-match identical (pinned by the gate hashes;
# A/B: 0.80 -> 0.68 s over the sf0.1 corpus).
_W = rf"(?=[a-z])(?!(?:{_STOP})\b)[a-z]++"
_NP = rf"{_W}(?: {_W})?"
_LIST = rf"{_NP}(?:, {_NP})*(?:,? (?:and|or) {_NP})?"

# (pattern name, regex, group of hyper, group of hypo-list, literal guard)
# the guard is a fixed substring the regex REQUIRES — a cheap contains()
# prefilter that skips the regex scan on the (vast) majority of documents
# that cannot match the pattern at all
HEARST_PATTERNS: tuple[tuple[str, str, int, int, str], ...] = (
    ("such_as", rf"({_NP}) such as ({_LIST})", 1, 2, " such as "),
    ("such_np_as", rf"such ({_NP}) as ({_LIST})", 1, 2, "such "),
    ("including", rf"({_NP}), including ({_LIST})", 1, 2, ", including "),
    ("especially", rf"({_NP}), especially ({_LIST})", 1, 2, ", especially "),
    # trailing hypernym is a SINGLE head word — a 2-word NP here would
    # greedily eat the following verb ("other metals shine")
    ("and_other", rf"({_LIST}) and other ({_W})", 2, 1, " and other "),
    ("or_other", rf"({_LIST}) or other ({_W})", 2, 1, " or other "),
)

_SPLIT_LIST = r",? (?:and|or) |, "


def hearst_pairs(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """One row per extracted pair: ``(url, hypo, hyper, pattern)``.

    Every pattern is applied to the lowercased text independently
    (``regexp_extract_all`` -> zip hyper/list matches positionally -> split
    the coordinated list -> explode), so one sentence can feed several
    patterns — corpus-level voting in ``taxonomy_edges`` sorts that out.
    """
    from .similarity import bind

    struct_t = (
        "array<struct<hyper:string,hypos:string,pattern:string>>"
    )

    def _pattern_rows(text):
        # all six patterns in ONE projection over one bound lowercase
        # text (the union-of-branches form scanned the corpus six
        # times, lowercasing each time); per-pattern extraction values
        # are unchanged, and the contains() guard still short-circuits
        # the regex scans inside the CaseWhen
        parts = []
        for name, rx, g_hyper, g_list, guard in HEARST_PATTERNS:
            # ONE full-document regex scan (group 0); capture groups
            # are re-extracted from each (short) match string. Safe for
            # these patterns: matches are self-contained — the greedy
            # [a-z]+ runs never stop before a letter, so the character
            # after a match is a non-letter in the document and
            # end-of-string in the match slice, and the stoplist
            # lookaheads only inspect text inside the match — so
            # re-matching the slice reproduces the original groups byte
            # for byte (pinned by the hearst_pairs gate hash + tests).
            matches = F.regexp_extract_all(text, F.lit(rx), 0)

            def _mk(_n, _rx, _gh, _gl):
                # factory closure: a defaulted second lambda parameter
                # would make PySpark pass the array INDEX instead
                return lambda m: F.struct(
                    F.regexp_extract(m, _rx, _gh).alias("hyper"),
                    F.regexp_extract(m, _rx, _gl).alias("hypos"),
                    F.lit(_n).alias("pattern"),
                )

            rows = F.transform(matches, _mk(name, rx, g_hyper, g_list))
            parts.append(
                F.when(text.contains(guard), rows)
                .otherwise(F.array().cast(struct_t))
            )
        return F.concat(*parts).cast(struct_t)

    return (
        docs.select(
            F.col(url_col).alias("url"),
            F.explode(
                bind(F.lower(F.col(text_col)), _pattern_rows)
            ).alias("_m"),
        )
        .select(
            "url",
            F.col("_m.hyper").alias("hyper"),
            F.explode(F.split(F.col("_m.hypos"), _SPLIT_LIST)).alias("hypo"),
            F.col("_m.pattern").alias("pattern"),
        )
        .filter((F.col("hypo") != "") & (F.col("hypo") != F.col("hyper")))
        .select("url", "hypo", "hyper", "pattern")
    )


def taxonomy_edges(pairs: DataFrame, min_support: int = 2) -> DataFrame:
    """Corpus-level taxonomy induction: aggregate pair evidence and settle
    direction conflicts — ``(hypo, hyper, n_mentions, n_patterns)``.

    A pair survives when it has >= ``min_support`` mentions AND beats its
    reciprocal (more mentions; lexicographically smaller hypo on an exact
    tie — deterministic on any partitioning). The self-join runs on the
    aggregated pair table (type-vocabulary sized), not the mention
    stream.
    """
    # agg feeds BOTH join legs (itself and rev); without a boundary each
    # leg re-derives the whole upstream chain — for the bench input that
    # re-ran the six-pattern regex extraction a second time (measured:
    # the full leg cost ~2x the pairs pass). The aggregated table is
    # type-vocabulary sized, so materializing it once is free.
    agg = pairs.groupBy("hypo", "hyper").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("pattern").cast("long").alias("n_patterns"),
    ).localCheckpoint(eager=False)
    rev = agg.select(
        F.col("hyper").alias("hypo"),
        F.col("hypo").alias("hyper"),
        F.col("n_mentions").alias("_rev_n"),
    )
    return (
        agg.join(rev, ["hypo", "hyper"], "left")
        .filter(
            (F.col("n_mentions") >= min_support)
            & (
                F.col("_rev_n").isNull()
                | (F.col("n_mentions") > F.col("_rev_n"))
                | (
                    (F.col("n_mentions") == F.col("_rev_n"))
                    & (F.col("hypo") < F.col("hyper"))
                )
            )
        )
        .select("hypo", "hyper", "n_mentions", "n_patterns")
    )
