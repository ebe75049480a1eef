"""Triangle counting over the KG edge relation.

Triangle density separates genuine entity clusters from star-shaped
boilerplate hubs (a hub pulled in by near-dup chains has huge degree but
no triangles), so this is the standard companion metric to degree/
PageRank when auditing a constructed graph.

Algorithm (the MapReduce-classic degree orientation, Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer"):

* undirect + dedup edges, drop self-loops;
* orient every edge from the LOWER-(degree, id) endpoint to the higher —
  each triangle becomes exactly one directed wedge pair, so no
  overcounting and, critically, every node's out-degree is bounded by
  O(sqrt(|E|)): a 10^8-degree hub (the "last reducer" that kills the
  naive wedge join) ends up with out-edges only toward HIGHER-degree
  nodes, of which there are few.
* wedges = oriented ⋈ oriented on the middle node; close each wedge by
  an equi-join back against the oriented edge set.

Two shuffles (wedge build + closure probe), both on uniform edge keys
after orientation. Exact — the gate oracle is the same oriented
triple-join restated in SQL, which DuckDB computes directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges oriented low(degree, id) -> high."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionAll(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    j = und.join(dx, "x").join(dy, "y")
    take_xy = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    return j.select(
        F.when(take_xy, F.col("x")).otherwise(F.col("y")).alias("a"),
        F.when(take_xy, F.col("y")).otherwise(F.col("x")).alias("b"),
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts: ``(node, triangles)``.
    Nodes in no triangle are omitted (join the node table for zeros)."""
    o = _oriented(edges, src, dst).localCheckpoint(eager=False)
    # wedge (u, v) at middle m, BOTH orderings (u != v): the orientation
    # total order is (degree, id), so filtering u < v lexicographically
    # would drop wedges whose closing edge is oriented the other way —
    # instead the closure equi-join keeps exactly the oriented ordering,
    # once per triangle.
    w1 = o.select(F.col("a").alias("m"), F.col("b").alias("u"))
    w2 = o.select(F.col("a").alias("m"), F.col("b").alias("v"))
    wedges = w1.join(w2, "m").filter(F.col("u") != F.col("v"))
    closer = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    tri = wedges.join(closer, ["u", "v"])  # (m, u, v) triangles, each once
    per_node = (
        tri.select(F.col("m").alias("node"))
        .unionAll(tri.select(F.col("u").alias("node")))
        .unionAll(tri.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return per_node


def triangle_total(edges: DataFrame, src: str = "src", dst: str = "dst") -> int:
    """Global triangle count (each triangle counted once)."""
    o = _oriented(edges, src, dst).localCheckpoint(eager=False)
    w1 = o.select(F.col("a").alias("m"), F.col("b").alias("u"))
    w2 = o.select(F.col("a").alias("m"), F.col("b").alias("v"))
    wedges = w1.join(w2, "m").filter(F.col("u") != F.col("v"))
    closer = o.select(F.col("a").alias("u"), F.col("b").alias("v"))
    return wedges.join(closer, ["u", "v"]).count()
