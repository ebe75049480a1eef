"""Clustering evaluation metrics for entity-resolution output.

The linking stage (``operators/linking.py``, SURVEY I8) produces
entity clusters; measuring them against a gold clustering is the
standard ER evaluation loop. Two metric families, both pure
aggregations (no windows, no UDFs — every count is an algebraic
groupBy, so map-side partial aggregation applies and the plan scales
to arbitrarily many items):

* **B-cubed** (Bagga & Baldwin 1998): per-item precision =
  |pred-cluster ∩ gold-cluster of the item| / |pred-cluster|, recall
  symmetric, averaged over items. The per-item intersection is derived
  WITHOUT a self-join: group items by (pred, gold) — every item in
  that cell has intersection size = the cell count — then join each
  cell to the pred- and gold-cluster sizes (two broadcast-sized
  dimension aggregates at realistic cluster-count/item ratios).
* **Pairwise precision/recall/F1** over co-clustered item pairs,
  computed from the same (pred, gold) cell counts with the n-choose-2
  identity — no pair enumeration, so a million-item cluster costs one
  aggregate row instead of ~5*10^11 pairs.

Both return one row of DOUBLE metrics; the gate oracle restates the
same cell-count algebra in SQL (exact integer counts, division at the
very end — DECIMAL ratios would be exact too, but the division is of
exact integers in both engines, so DOUBLE is reproducible).

Beyond-ref analytics (the reference never evaluates its linking —
`/root/reference/src` has no metric code); standard for any KG
construction pipeline at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _checked(name: str) -> Column:
    """Cluster-id column with a loud NULL guard. A NULL assignment
    would form its own groupBy cell but then silently drop out of the
    equi-joins on cluster id (NULL never equals NULL), vanishing from
    n_items and every metric — raise at execution instead."""
    c = F.col(name)
    return F.when(c.isNotNull(), c).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"cluster_eval: NULL {name} in assignment table "
                      "(unassigned items must be filtered or given a "
                      "singleton cluster id before evaluation)")
            )
        )
    ).alias(name)


def _cells(assign: DataFrame, pred: str, gold: str) -> DataFrame:
    """(pred, gold) contingency cells. Assumes one row per item —
    callers pass an assignment table, not an event log.

    Materialized lazily: every metric derives three aggregates from the
    cell table (sizes per side plus the joined/total view), and without
    a boundary each would re-scan the assignment and re-count. The
    table is contingency-sized (cluster vocabularies), tiny."""
    return (
        assign.select(_checked(pred), _checked(gold))
        .groupBy(pred, gold)
        .agg(F.count(F.lit(1)).alias("cell"))
        .localCheckpoint(eager=False)
    )


def bcubed(
    assign: DataFrame,
    item_col: str = "item",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row: (n_items, bcubed_precision, bcubed_recall, bcubed_f1).

    Identity used: every item in a (pred, gold) cell of size c has
    per-item precision c / |pred| and recall c / |gold|, so the
    average over items is sum(cell * cell/size) / n — three aggregates
    and two joins on cluster ids, no per-item work.
    """
    cells = _cells(assign, pred_col, gold_col)
    pred_sz = cells.groupBy(pred_col).agg(F.sum("cell").alias("psz"))
    gold_sz = cells.groupBy(gold_col).agg(F.sum("cell").alias("gsz"))
    j = cells.join(pred_sz, pred_col).join(gold_sz, gold_col)
    return j.agg(
        F.sum("cell").cast("long").alias("n_items"),
        (F.sum(F.col("cell") * F.col("cell") / F.col("psz"))
         / F.sum("cell")).alias("bcubed_precision"),
        (F.sum(F.col("cell") * F.col("cell") / F.col("gsz"))
         / F.sum("cell")).alias("bcubed_recall"),
    ).select(
        "n_items",
        "bcubed_precision",
        "bcubed_recall",
        _safe_f1(F.col("bcubed_precision"), F.col("bcubed_recall"))
        .alias("bcubed_f1"),
    )


def _safe_f1(p: Column, r: Column) -> Column:
    """Harmonic mean, NULL when p + r == 0 (ANSI mode raises on /0)."""
    return F.when(p + r > 0, 2 * p * r / (p + r))


def _pairs_sum(col: str) -> Column:
    """sum over rows of C(col, 2) as an EXACT BIGINT aggregate: c*(c-1)
    is always even, so a right shift halves it without leaving integer
    arithmetic — the '/' operator would route every term (and the
    running sum) through float64 and lose exactness for counts above
    ~1.3e8 (c*(c-1) > 2^53)."""
    return F.sum(
        F.shiftright(F.col(col).cast("long") * (F.col(col) - 1), 1)
    ).cast("long")


def pairwise_metrics(
    assign: DataFrame,
    item_col: str = "item",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """One row: (tp_pairs, pred_pairs, gold_pairs, pair_precision,
    pair_recall, pair_f1) over co-clustered item pairs, via the
    n-choose-2 identity on cell/cluster sizes — no pair enumeration."""

    c2 = _pairs_sum
    cells = _cells(assign, pred_col, gold_col)
    tp = cells.agg(c2("cell").alias("tp_pairs"))
    pp = (
        cells.groupBy(pred_col).agg(F.sum("cell").alias("sz"))
        .agg(c2("sz").alias("pred_pairs"))
    )
    gp = (
        cells.groupBy(gold_col).agg(F.sum("cell").alias("sz"))
        .agg(c2("sz").alias("gold_pairs"))
    )
    # three single-row aggregates crossed together: stays declarative
    # (one job, no driver round-trips); NULL metrics when a side has no
    # co-clustered pairs at all (ANSI mode raises on /0 otherwise)
    prec = F.when(
        F.col("pred_pairs") > 0, F.col("tp_pairs") / F.col("pred_pairs")
    )
    rec = F.when(
        F.col("gold_pairs") > 0, F.col("tp_pairs") / F.col("gold_pairs")
    )
    return (
        tp.crossJoin(pp).crossJoin(gp)
        .select(
            "tp_pairs", "pred_pairs", "gold_pairs",
            prec.alias("pair_precision"),
            rec.alias("pair_recall"),
            _safe_f1(prec, rec).alias("pair_f1"),
        )
    )
