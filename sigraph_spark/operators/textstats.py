"""Text-analysis operators for the training-data pipeline.

These are first-class components of the 100 TB pipeline (driver brief):
language identification, quality scoring, token counting, and document
fingerprinting over the ``documents`` table. Every operator is a pure
Column-expression plan — zero Python on the executor path — so each is
whole-stage-codegen'd and oracle-checkable in ANSI SQL (DuckDB).

Design notes for scale:
* every function is a narrow map over the scan — no shuffle at all;
* all use only the ``text`` column, so Catalyst prunes everything else
  (parquet ReadSchema shows just the needed columns);
* deterministic arithmetic only (no locale, no RNG) so two cluster sizes
  produce identical outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic language
# identifier. Order matters: first language whose score wins ties is listed
# first (deterministic tie-break by list order then name).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "las"),
}

_WORD_RE = r"[A-Za-z0-9_']+"
# BPE-ish token regex: words, numbers, or single non-space symbols — a
# deterministic stand-in for a real tokenizer's piece count.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(c: Column) -> Column:
    """Whitespace-delimited token count. Empty/null text -> 0."""
    t = F.trim(F.coalesce(c, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + individual symbols.

    ``regexp_count`` keeps this JVM-side; the same regex runs in DuckDB
    for the oracle (``regexp_extract_all`` length).
    """
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(_BPE_RE)).cast("long")


def word_count(c: Column) -> Column:
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(_WORD_RE)).cast("long")


def quality_features(c: Column) -> list[Column]:
    """Quality-scoring feature columns: length, tokens, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio.

    The composite ``quality_score`` below follows the usual web-text
    heuristics (Gopher/C4-style rules re-expressed as arithmetic).
    """
    t = F.coalesce(c, F.lit(""))
    n_chars = F.length(t).cast("double")
    n_words = word_count(t).cast("double")
    word_chars = F.length(F.regexp_replace(t, r"[^A-Za-z0-9_']", "")).cast("double")
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]")).cast("double")
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]")).cast("double")
    lw = F.lower(t)
    n_stop = F.regexp_count(
        lw, F.lit(r"\b(the|and|of|to|is|in|that|it|was|for)\b")
    ).cast("double")
    safe = F.greatest(n_words, F.lit(1.0))
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    return [
        n_chars.alias("n_chars_text"),
        n_words.alias("n_words"),
        (word_chars / safe).alias("mean_word_len"),
        (n_punct / safe_chars).alias("punct_ratio"),
        (n_stop / safe).alias("stopword_ratio"),
        (n_upper / safe_chars).alias("upper_ratio"),
    ]


def quality_score() -> Column:
    """Composite 0..1 quality score from the feature columns (call after
    selecting ``quality_features``). Pure arithmetic — deterministic."""
    in_range = (
        (F.col("n_words") >= 5)
        & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0)
    ).cast("double")
    stop_ok = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 4.0)
    upper_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("upper_ratio") * 2.0)
    return (in_range * (0.4 * stop_ok + 0.3 * punct_pen + 0.3 * upper_pen)).alias(
        "quality_score"
    )


def lang_id(c: Column) -> Column:
    """N-gram/stopword-marker language ID over a closed language set.

    Scores each language by marker hit count (word-boundary regex); returns
    the argmax with deterministic tie-break (marker-list order). Unknown
    (zero hits anywhere) -> 'und'. All JVM-side regexp_count — vectorizable,
    and the identical expression runs in DuckDB for the oracle.
    """
    lw = F.lower(F.coalesce(c, F.lit("")))
    scores = {
        lang: F.regexp_count(lw, F.lit(r"\b(" + "|".join(markers) + r")\b"))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in declaration order; strict '>' keeps the earlier language on
    # ties => deterministic
    for lang, score in scores.items():
        take = score > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, score).otherwise(best_score)
    return best


# prime just under 2^56: acc < P so acc*31 + 255 < 2^63 — exact in int64
# even under Spark ANSI mode (no wrapping arithmetic anywhere)
FINGERPRINT_P = 72057594037927931


def fingerprint64(c: Column) -> Column:
    """Rolling polynomial document fingerprint ``acc = (acc*31 + code) mod
    (2^61-1)`` over the char codepoints of the first 4096 chars — pure
    Column expression (``aggregate`` over ``split``).

    Modular (not wrapping) arithmetic so the identical recurrence runs
    under Spark ANSI mode and in DuckDB SQL (``list_reduce``) — the point
    of a *portable* fingerprint. For Spark-only identity prefer
    ``xxhash64(text)`` (cheaper); this is the cross-engine-checkable
    variant, collision-safe at dedup grade (~56-bit).
    """
    prefix = F.substring(F.coalesce(c, F.lit("")), 1, 4096)
    codes = F.transform(F.split(prefix, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.when(F.length(prefix) == 0, F.lit(7).cast("long")).otherwise(
        # split("", "") yields [""] — the length guard above keeps the
        # empty document at the seed value like the plain recurrence
        F.aggregate(
            codes,
            F.lit(7).cast("long"),
            lambda acc, x: (acc * F.lit(31).cast("long") + x) % F.lit(FINGERPRINT_P),
        )
    )


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text-analysis profile of a documents table."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        *quality_features(t),
        whitespace_token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        fingerprint64(t).alias("fingerprint"),
    ).select("*", quality_score())
