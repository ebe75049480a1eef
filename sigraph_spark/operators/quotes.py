"""Quotation + attribution extraction from page text.

Webtext carries statements whose PROVENANCE is part of the fact:
``Alice Carter said "the segment is stable."`` A KG builder mines these
as attributed-statement nodes (speaker, verb, quote) — the quote/claim
layer news-KG pipelines (e.g. GDELT-style event coding, quote banks)
extract next to relation triples.

One combined regex, three attribution shapes (pinned by the
``quotes_extract`` gate + tests):

* PRE  — ``Speaker verb[,:]? "quote"``          (groups 1/2/3)
* POST — ``"quote[,!?.]" verb Speaker``          (groups 4/5/6)
* ACC  — ``According to Speaker, "quote"``       (groups 7/8, verb
  pinned to the literal ``according_to``)

Speaker = a run of 1-3 capitalized tokens (the closed NP heuristic the
sentence extractor also uses — no NER model); verb inventory = said /
says / stated / warned / noted / added / claimed / wrote; quotes are
double-quoted spans up to 500 chars; the TRAILING punctuation that
English style places inside the closing quote (``,.;:!?``) is stripped
from the quote text. ``quote_idx`` numbers matches in document order
across all three shapes (one regex pass — alternation preserves
position order).

Scale design: six zipped ``regexp_extract_all`` passes over the same
pattern + one ``posexplode`` — a single narrow map, zero shuffle, zero
UDF (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# no '.' in speaker tokens: a sentence boundary after a POST-shape
# speaker ("said Max. Ada wrote ...") must terminate the NP, not fuse
# two names across it (initials like "J. R." are pinned OUT)
_SPEAKER = r"[A-Z][A-Za-z0-9-]*(?:[ ][A-Z][A-Za-z0-9-]*){0,2}"
_VERB = r"(?:said|says|stated|warned|noted|added|claimed|wrote)"

QUOTE_RE = (
    rf"({_SPEAKER})\s+({_VERB})[,:]?\s+\"([^\"]{{1,500}})\""
    rf"|\"([^\"]{{1,500}})\"\s*({_VERB})\s+({_SPEAKER})"
    rf"|[Aa]ccording to\s+({_SPEAKER}),?\s+\"([^\"]{{1,500}})\""
)

_TRAIL = r"[,.;:!?]+$"


def extract_quotes(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Docs -> ``(url, quote_idx, speaker, verb, quote)`` attributed
    statements; verb is the attribution verb (or ``according_to``)."""
    from sigraph_spark.functions.hof import zip_match_groups

    text = F.col(text_col)
    # one group-0 scan + per-match group pulls (was eight full-text
    # passes of the same pattern, one per capture group)
    passes = zip_match_groups(
        text, QUOTE_RE, [f"g{g}" for g in range(1, 9)]
    )
    x = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(passes).alias("quote_idx", "m"),
    )
    m = F.col("m")

    def pick(*groups: int) -> Column:
        out = F.lit("")
        for g in groups:
            out = F.when(out != "", out).otherwise(m[f"g{g}"])
        return out

    speaker = pick(1, 6, 7)
    verb = F.when(pick(2, 5) != "", F.lower(pick(2, 5))).otherwise(
        F.lit("according_to")
    )
    quote = F.regexp_replace(F.trim(pick(3, 4, 8)), _TRAIL, "")
    return x.select(
        "url", "quote_idx",
        speaker.alias("speaker"), verb.alias("verb"), quote.alias("quote"),
    ).filter((F.col("speaker") != "") & (F.col("quote") != ""))
