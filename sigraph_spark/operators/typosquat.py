"""Typosquat detection: deletion-key blocking for edit-distance-1
neighbors (round 5).

The fat-finger complement of ``confusables.py``'s homoglyph skeletons:
typosquatted identifiers (``gogle.com``, ``goggle.com``, ``gpogle``
/ ``googlr``) sit at Levenshtein distance 1 from their targets, and
an all-pairs distance join is quadratic. The SymSpell device (Garbe's
symmetric-delete algorithm) makes it an equi-join: two strings at
edit distance <= 1 ALWAYS share a member of their 1-deletion
neighborhoods —

- insertion/deletion: the shorter string IS in the longer one's
  deletion set (and trivially in its own);
- substitution: deleting the differing position from both yields the
  same string.

So candidates = self-join on exploded deletion keys (each string emits
``len + 1`` keys), then one exact ``levenshtein() <= 1`` verify — both
steps JVM built-ins, zero Python anywhere. The oracle is the
INDEPENDENT quadratic formulation (all-pairs ``levenshtein`` in SQL),
so the gate proves the blocking loses nothing.

Scale shape: key explosion is a narrow map emitting O(len) rows per
identifier; the only shuffle is the key join. Hot keys are short
strings' deletion sets (e.g. every 2-char name shares keys) — the
``min_len`` floor drops them loudly, matching real typosquat hunts
which ignore 1-3 char names anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_keys", "typo_pairs", "combosquat_pairs"]


def deletion_keys(name):
    """Column: array of the string's 1-deletion neighborhood INCLUDING
    itself (the SymSpell key set for max_edits=1)."""
    n = F.length(name)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(name.substr(F.lit(1), i - 1),
                           name.substr(i + 1, n)),
    )
    return F.array_union(F.array(name), dels)


def typo_pairs(
    entities: DataFrame,
    id_col: str = "name",
    min_len: int = 4,
) -> DataFrame:
    """Identifier pairs at Levenshtein distance exactly 1 (a < b) plus
    the distance column — ``(a, b, dist)``. Names shorter than
    ``min_len`` are excluded (their deletion sets are hot keys and
    real hunts ignore them)."""
    named = (
        entities.select(F.col(id_col).alias("name")).distinct()
        .filter(F.length("name") >= min_len)
    )
    # keyed feeds BOTH self-join legs; without a boundary each leg
    # re-runs the distinct and the deletion-key explode
    keyed = named.select(
        "name", F.explode(deletion_keys(F.col("name"))).alias("k")
    ).localCheckpoint(eager=False)
    a = keyed.select("k", F.col("name").alias("a"))
    b = keyed.select("k", F.col("name").alias("b"))
    return (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .withColumn("dist", F.levenshtein("a", "b"))
        .filter(F.col("dist") == 1)
    )


def combosquat_pairs(
    domains: DataFrame,
    brands: DataFrame,
    domain_col: str = "domain",
    brand_col: str = "brand",
) -> DataFrame:
    """Combosquats — the third member of the domain-abuse triad beside
    homoglyphs and typos: registrations that EMBED a brand token in a
    larger label (``paypal-login.com``, ``secure-paypal.net``).
    -> ``(domain, brand)`` where the registrable label (the part
    before the last dot) strictly contains the brand token but is not
    the brand itself.

    Scale shape: brands are vocabulary-sized, so this is a BROADCAST
    theta-join (contains) — O(domains x |brands|) work with the brand
    side in memory, the shape every brand-monitoring feed uses; the
    corpus is never shuffled."""
    label = F.regexp_extract(F.col(domain_col), r"^(.*)\.[^.]+$", 1)
    d = domains.select(F.col(domain_col).alias("domain"),
                       F.lower(label).alias("_label")).distinct()
    b = brands.select(F.lower(F.col(brand_col)).alias("brand")).distinct()
    return (
        d.join(F.broadcast(b),
               F.col("_label").contains(F.col("brand"))
               & (F.col("_label") != F.col("brand")))
        .select("domain", "brand")
    )
