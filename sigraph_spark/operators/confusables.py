"""Homoglyph canonicalization + spoof-pair detection (round 5).

Threat-intel entity matching (the reference's domain): attackers
register lookalike identifiers — Cyrillic ``а`` for Latin ``a`` in a
domain, fullwidth forms, diacritic tricks, punycode wrappers — that
defeat exact-string joins. This module computes a Unicode-confusable
SKELETON (the device of UTS #39 §4 "Confusable Detection": map every
character to its prototype, compare skeletons) so spoofed identifiers
collide with their targets:

1. punycode labels decode first (``xn--`` via the stdlib IDNA codec —
   the registered form is what the wire carries);
2. NFKD normalization folds compatibility forms (fullwidth, ligatures)
   and splits diacritics, which are then dropped (combining class);
3. a curated prototype map folds the high-frequency cross-script
   confusables (Cyrillic/Greek lookalikes, digit/letter pairs the
   UTS #39 data lists first) — deliberately the COMMON subset, not the
   full confusables.txt (shipping a 6k-line table from memory would be
   less trustworthy than a small audited one; the map is data, so a
   deployment can load the full table into the same operator);
4. case-fold.

Operators: :func:`skeleton_udf` (Arrow batch), :func:`spoof_pairs` —
identifiers whose skeletons COLLIDE while their raw forms differ =
spoof candidates ``(a, b, skeleton)``. Blocking is the skeleton
equi-join (never all-pairs); the hot-key guard is structural: a
skeleton bucket is a candidate set, and real attacks sit in small
buckets (a cap parameter drops pathological buckets).

Scale shape: skeleton is one Arrow pass; the only shuffle is the
skeleton groupBy. Reference parity: extends sigraph's IoC plane
(SURVEY §2 A12) with the matching layer it lacks.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["confusable_skeleton", "skeleton_udf", "spoof_pairs"]

# high-frequency cross-script prototypes (UTS #39 confusables head):
# Cyrillic + Greek lookalikes of Latin letters, and the digit pairs.
_PROTO = {
    # Cyrillic -> Latin
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x",
    "у": "y", "і": "i", "ј": "j", "ѕ": "s", "һ": "h", "ԁ": "d",
    "ɡ": "g", "ԛ": "q", "ԝ": "w", "в": "b", "к": "k", "м": "m",
    "н": "h", "т": "t",
    # Greek -> Latin
    "α": "a", "β": "b", "γ": "y", "ε": "e", "ι": "i", "κ": "k",
    "ν": "v", "ο": "o", "ρ": "p", "τ": "t", "υ": "u", "χ": "x",
    "ω": "w",
    # digit / letter
    "0": "o", "1": "l", "ł": "l",
    # punctuation lookalikes
    "‐": "-", "–": "-", "—": "-", "․": ".", "。": ".",
}


def confusable_skeleton(s: str | None) -> str | None:
    """Pure-Python skeleton (the UDF kernel; deterministic)."""
    if s is None:
        return None
    # 1. punycode labels (domains): decode each xn-- label
    if "xn--" in s:
        parts = []
        for label in s.split("."):
            if label.lower().startswith("xn--"):
                try:
                    label = label.encode("ascii").decode("idna")
                except (UnicodeError, UnicodeDecodeError):
                    pass  # malformed punycode stays literal (loudness
                    # would reject real-world junk wholesale)
            parts.append(label)
        s = ".".join(parts)
    # 2. NFKD + drop combining marks
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue
        out.append(_PROTO.get(ch, ch))
    # 3+4. prototype map applied above; case-fold last (the map keys
    # are lowercase, so fold BEFORE a second map pass for uppercase
    # confusables)
    folded = "".join(out).casefold()
    return "".join(_PROTO.get(ch, ch) for ch in folded)


def skeleton_udf():
    import pandas as pd

    def _sk(col):
        return col.map(confusable_skeleton)

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints beyond the type
    # checker's reach
    _sk.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return F.pandas_udf(_sk, "string")


def spoof_pairs(
    entities: DataFrame,
    id_col: str = "name",
    max_bucket: int = 50,
) -> DataFrame:
    """Identifiers whose skeletons collide while the raw strings
    differ -> ``(a, b, skeleton)`` with a < b. Buckets larger than
    ``max_bucket`` drop (pathological prototypes — a real spoof sits
    beside its one target, not in a thousand-way pile-up); the drop is
    visible as the ``oversize_buckets`` count on the returned plan via
    ``.observe`` is not used — callers needing the diagnostic join
    ``bucket_histogram`` from ``dedup``."""
    sk = skeleton_udf()
    # named feeds the bucket-size aggregate AND the join's left leg;
    # sized feeds both self-join legs. Without boundaries the skeleton
    # pandas UDF (an opaque subplan — no exchange reuse) re-ran over
    # the vocabulary once per derivation, up to four times. Two lazy
    # materializations run it exactly once.
    named = entities.select(F.col(id_col).alias("name")).distinct() \
        .withColumn("skeleton", sk(F.col("name"))).localCheckpoint(eager=False)
    sized = named.join(
        named.groupBy("skeleton").agg(F.count(F.lit(1)).alias("_n")),
        "skeleton",
    ).filter(F.col("_n") <= max_bucket).drop("_n").localCheckpoint(eager=False)
    a = sized.select("skeleton", F.col("name").alias("a"))
    b = sized.select("skeleton", F.col("name").alias("b"))
    return (
        a.join(b, "skeleton")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "skeleton")
    )
