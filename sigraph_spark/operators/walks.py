"""Deterministic random-walk corpus generation over the KG edge table.

Random walks are how a knowledge graph becomes embedding-training data
(DeepWalk/node2vec-style skip-gram pairs). A cluster-friendly walk
generator must be (a) one frontier join per step — never per-walker
driver loops — and (b) REPRODUCIBLE: the same input must yield the same
walks on any partitioning/cluster size, or the scaling criterion itself
is unmeasurable.

Determinism comes from hash-based choice: at step t the walker at node
``u`` moves to the out-neighbor ``v`` minimizing the portable 32-bit hash
``hash32_md5_le(start|walk|t|v)`` (``operators/dedup.py``). That is a
pseudorandom uniform pick per (walker, step) — different walkers at the
same node diverge, the same walker re-visiting a node at a different step
diverges — yet every engine reproduces it exactly (DuckDB:
``md5_number_upper & 0xFFFFFFFF``), which is what makes the gate
hard-oracle-able via L unrolled rounds.

Scale shape per step: one equi-join frontier⋈edges on the node key + one
min-struct aggregation on the walker key. Both keys are uniform
(walker ids spread hubs across the cluster — a hub node's candidates
group by WALKER, not by node, so there is no last-reducer hub). For a
bucketed edge table the join side is storage-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash32_md5_le


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``walks_per_node`` deterministic walks of up to ``length`` steps
    from every distinct source node; walkers at a sink stop early.

    Returns ``(start, walk, step, node)`` — one row per visited position
    (step 0 is the start node itself).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = (
        e.select(F.col("u").alias("start"))
        .distinct()
        .select(
            "start",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(walks_per_node - 1).cast("long")
                )
            ).alias("walk"),
        )
        .select("start", "walk", F.lit(0).alias("step"), F.col("start").alias("node"))
    )
    out = cur
    for t in range(1, length + 1):
        cand = cur.join(e, cur.node == e.u).select(
            "start",
            "walk",
            hash32_md5_le(
                F.concat_ws("|", F.col("start"), F.col("walk"), F.lit(t), F.col("v"))
            ).alias("h"),
            F.col("v"),
        )
        cur = (
            cand.groupBy("start", "walk")
            .agg(F.min(F.struct("h", "v")).alias("m"))
            .select(
                "start", "walk", F.lit(t).alias("step"), F.col("m.v").alias("node")
            )
        )
        out = out.unionByName(cur)
    return out.select(
        "start", "walk", F.col("step").cast("long").alias("step"), "node"
    )


def random_walks_oracle_sql(
    edges_cte: str, walks_per_node: int, length: int
) -> str:
    """Unrolled-round ANSI-SQL restatement (DuckDB) of :func:`random_walks`
    over a relation with columns (src, dst). MATERIALIZED rounds — each is
    referenced by the next and by the final union."""
    parts = [
        f"""de AS MATERIALIZED (SELECT DISTINCT src, dst FROM {edges_cte}),
        s0 AS MATERIALIZED (
          SELECT src AS start, CAST(wi AS BIGINT) AS walk, 0 AS step,
                 src AS node
          FROM (SELECT DISTINCT src FROM de),
               UNNEST(range(0, {walks_per_node})) AS t(wi))"""
    ]
    for t in range(1, length + 1):
        parts.append(
            f"""s{t} AS MATERIALIZED (
              SELECT start, walk, {t} AS step, node FROM (
                SELECT s.start, s.walk, e.dst AS node,
                       row_number() OVER (
                         PARTITION BY s.start, s.walk
                         ORDER BY CAST(md5_number_upper(
                             s.start || '|' || CAST(s.walk AS VARCHAR)
                             || '|{t}|' || e.dst) & 4294967295 AS BIGINT),
                           e.dst) AS rn
                FROM s{t - 1} s JOIN de e ON e.src = s.node)
              WHERE rn = 1)"""
        )
    union = "\n          UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(length + 1)
    )
    return ",\n".join(parts) + f"""
        SELECT start, walk, CAST(step AS BIGINT) AS step, node FROM (
          {union})"""


def skipgram_oracle_sql(
    edges_cte: str, walks_per_node: int, length: int, window: int
) -> str:
    """Oracle for :func:`skipgram_pairs` over :func:`random_walks` output:
    the walk CTEs + a windowed self-join on the walker key."""
    walks = random_walks_oracle_sql(edges_cte, walks_per_node, length)
    cte_part, final = walks.rsplit("\n        SELECT start, walk,", 1)
    return (
        cte_part
        + f""",
        w AS MATERIALIZED (
          SELECT start, walk,{final})
        SELECT a.node AS center, b.node AS context,
               CAST(count(*) AS BIGINT) AS n
        FROM w a JOIN w b
          ON a.start = b.start AND a.walk = b.walk
         AND a.step <> b.step AND abs(a.step - b.step) <= {window}
        GROUP BY 1, 2"""
    )


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) co-occurrence pairs within ``window`` steps along
    each walk — the skip-gram training set. One self-join per walk keyed
    on the walker id (uniform), band-limited by the step distance."""
    a = walks.select("start", "walk", F.col("step").alias("i"), F.col("node").alias("center"))
    b = walks.select("start", "walk", F.col("step").alias("j"), F.col("node").alias("context"))
    return (
        a.join(b, ["start", "walk"])
        .filter((F.col("i") != F.col("j")) & (F.abs(F.col("i") - F.col("j")) <= window))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def negative_samples(
    pairs: DataFrame,
    k: int = 3,
    center_col: str = "center",
    context_col: str = "context",
) -> DataFrame:
    """Deterministic unigram negative sampling for skip-gram training:
    for each (center, context) pair emit ``k`` negatives drawn
    pseudo-randomly (portable md5 hash of pair x slot) from the node
    vocabulary of the pair table itself; each draw that collides with the
    pair's true context is dropped (standard word2vec behavior), so a
    pair yields up to ``k`` negatives — typically all k, fewer only at
    collision odds ~k/|V|.

    Scale shape: the vocabulary's dense rank index is a BANDED two-stage
    construction (the pack_sequences device), not a global
    ``Window.orderBy`` — a partition-less window funnels the whole
    vocabulary through one task. Bands are order-preserving string
    prefixes, ranks are per-band row_numbers plus broadcast band base
    offsets; the result is exactly the global lexicographic dense rank,
    so the oracle's plain row_number reproduces it. The pair side
    explodes k slots (narrow) and resolves draws via an equi-join on the
    rank. Deterministic on any partitioning.

    Returns ``(center, context, slot, negative)``.
    """
    vocab = (
        pairs.select(F.col(center_col).alias("node"))
        .unionAll(pairs.select(F.col(context_col).alias("node")))
        .distinct()
        .withColumn("_b", F.substring(F.col("node"), 1, 3))
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("_b").orderBy("node")
    local = vocab.withColumn("_local", F.row_number().over(w_in) - 1)
    w_band = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        vocab.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_base", F.coalesce(F.sum("_cnt").over(w_band), F.lit(0)))
        .select("_b", "_base")
    )
    indexed = (
        local.join(F.broadcast(bases), "_b")
        .select("node", (F.col("_local") + F.col("_base")).alias("rank"))
    )
    n = vocab.count()
    slots = pairs.select(
        F.col(center_col).alias("center"),
        F.col(context_col).alias("context"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot"),
    )
    drawn = slots.withColumn(
        "rank",
        hash32_md5_le(
            F.concat_ws("|", F.col("center"), F.col("context"), F.col("slot"))
        )
        % F.lit(n),
    )
    return (
        drawn.join(F.broadcast(indexed), "rank")
        .filter(F.col("node") != F.col("context"))
        .select(
            "center", "context",
            F.col("slot").cast("long").alias("slot"),
            F.col("node").alias("negative"),
        )
    )


def negative_samples_oracle_sql(pairs_cte: str, k: int) -> str:
    """Oracle: the same rank-indexed vocabulary + md5 draw in SQL, over a
    relation with columns (center, context)."""
    return f"""
        vocab AS MATERIALIZED (
          SELECT node, row_number() OVER (ORDER BY node) - 1 AS rank FROM (
            SELECT DISTINCT center AS node FROM {pairs_cte}
            UNION SELECT DISTINCT context FROM {pairs_cte})),
        nn AS (SELECT count(*) AS n FROM vocab),
        slots AS (
          SELECT center, context, CAST(s AS BIGINT) AS slot,
                 CAST(md5_number_upper(center || '|' || context || '|'
                      || CAST(s AS VARCHAR)) & 4294967295 AS BIGINT)
                   %% (SELECT n FROM nn) AS rank
          FROM {pairs_cte}, UNNEST(range(1, {k} + 1)) AS t(s))
        SELECT slots.center, slots.context, slots.slot,
               vocab.node AS negative
        FROM slots JOIN vocab ON vocab.rank = slots.rank
        WHERE vocab.node <> slots.context
    """.replace("%%", "%")
