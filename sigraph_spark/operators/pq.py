"""Product quantization (PQ) for billion-scale ANN (round 5).

The missing member of the similarity family (brute force / LSH / IVF):
PQ compresses each vector to M sub-space codeword ids (Jégou, Douze &
Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
2011 — the technique behind FAISS's IVF-PQ indexes), so a 64-dim
float32 vector becomes M=8 bytes and distance evaluation never touches
the original vectors: Asymmetric Distance Computation (ADC) looks each
code up in a per-query table of query-to-codeword distances.

Engine-portable by construction, like ``similarity.ivf_train_lloyd``:

- training (:func:`pq_train_lloyd`): per-sub-space Lloyd with seeds =
  the sub-vectors of the ``k`` smallest ids, assignment = FIRST-index
  argmin of squared L2, update = per-dimension fixed-point BIGINT sums
  (order-independent) with mean ``s / (scale * n)``; empty clusters
  keep their previous codeword. All M sub-spaces train in the SAME
  Spark jobs (sub-space index is a column, not a loop dimension).
- encoding (:func:`pq_encode`): pure Column expressions against the
  literal codebooks — one narrow map, no UDF.
- search (:func:`pq_topk`): ADC with the squared-L2 expansion
  ``|q|^2 - 2<q,c> + |c|^2`` (left-assoc fold dots — the shape DuckDB's
  ``list_dot_product`` reproduces bit-for-bit), per-query table of
  M x K doubles built as literals, distance = left-assoc chain over M
  lookups, rounded to 6dp only at the output boundary.

Scale shape: training touches the corpus ``iters`` times with k-key
map-side-combined aggregations; encoding is one narrow map; search
scans CODES (M ints per vector, ~32x smaller than the raw corpus) with
a broadcast query table — the salted two-stage top-k from
``similarity.topk_per_query`` finishes it. At 10^12 vectors you train
on a sample, freeze the codebooks, and encode incrementally — exactly
the IVF deployment story, compounded by the 32x scan shrink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot

__all__ = ["pq_train_lloyd", "pq_encode", "pq_topk",
           "ivfpq_train", "ivfpq_encode", "ivfpq_topk"]


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _sqdist(a, b):
    """Squared L2 via the dot expansion — the one shape both engines
    evaluate identically (each dot a left-assoc fold)."""
    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def _sub(vec, m: int, d: int):
    return F.slice(vec, m * d + 1, d)


def _cluster_expr(vec, codebook_m: list[list[float]], m: int, d: int):
    """FIRST-index argmin of squared L2 to the sub-space codewords."""
    cb = F.array(*[F.array(*[F.lit(x) for x in c]) for c in codebook_m])
    dists = F.transform(cb, lambda c: _sqdist(_sub(vec, m, d), c))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train_lloyd(
    corpus: DataFrame,
    m: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 24,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks -> ``[m][k][d_sub]`` floats. The
    ``pq_topk`` gate oracle unrolls these exact iterations as chained
    SQL CTEs; see the module docstring for the portability contract."""
    v = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    first = v.select(F.size("v").alias("n")).limit(1).collect()
    if not first:
        raise ValueError("pq_train_lloyd: empty corpus")
    dim = first[0]["n"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    seed_rows = v.orderBy("vec_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} codewords")
    books = [[[float(seed_rows[j]["v"][mi * d + t]) for t in range(d)]
              for j in range(k)] for mi in range(m)]
    for _ in range(iters):
        # one job assigns EVERY sub-space: rows (m, cluster, j, fx)
        parts = []
        for mi in range(m):
            cl = _cluster_expr(F.col("v"), books[mi], mi, d)
            parts.append(F.struct(
                F.lit(mi).alias("m"), cl.alias("cluster"),
                _sub(F.col("v"), mi, d).alias("sub")))
        exploded = v.select(
            F.explode(F.array(*parts)).alias("a")
        ).select("a.m", "a.cluster", F.posexplode("a.sub").alias("j", "x"))
        agg = (
            exploded.groupBy("m", "cluster", "j")
            .agg(
                F.sum(F.floor(F.col("x") * scale).cast("long")).alias("s"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .collect()
        )
        upd: dict[tuple[int, int], list] = {}
        for r in agg:
            upd.setdefault((r["m"], r["cluster"]), [None] * d)[r["j"]] = (
                r["s"], r["n"])
        for (mi, cj), dims in upd.items():
            if any(x is None for x in dims):
                continue
            books[mi][cj] = [s / (scale * n) for s, n in dims]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> ``(vec_id, codes array<int>)`` — M first-index argmins as
    pure Column expressions (one narrow map)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    v = _as_double(F.col(vec_col))
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.array(*[_cluster_expr(v, codebooks[mi], mi, d)
                  for mi in range(m)]).alias("codes"),
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k -> ``(query_id, vec_id, adist, rank)`` (adist = PQ
    approximation of squared L2, rounded 6dp at the boundary; rank by
    adist ASC then vec_id). The scan touches only the codes."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    qv = _as_double(F.col(vec_col))

    def _table(mi: int):
        # factory closure: a two-parameter lambda would make PySpark
        # pass the array INDEX as the second argument
        cb = F.array(*[F.array(*[F.lit(x) for x in c])
                       for c in codebooks[mi]])
        return F.transform(
            cb, lambda c: _sqdist(_sub(qv, mi, d), c)).alias(f"t{mi}")

    tables = [_table(mi) for mi in range(m)]
    q = queries.select(F.col(query_id_col).alias("query_id"), *tables)
    joined = encoded.crossJoin(F.broadcast(q))
    adist = F.element_at(F.col("t0"),
                         F.element_at("codes", 1).cast("int") + 1)
    for mi in range(1, m):
        adist = adist + F.element_at(
            F.col(f"t{mi}"), F.element_at("codes", mi + 1).cast("int") + 1)
    scored = joined.select(
        "query_id", "vec_id", F.round(adist, 6).alias("adist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + PQ on residuals — the composed FAISS index
# ---------------------------------------------------------------------------

def _residual(vec, cents: list[list[float]], cluster_col):
    """normalized(vec) - centroid[cluster] — the residual the PQ
    codebooks quantize (unit-sphere L2, consistent with the coarse
    quantizer's cosine assignment)."""
    from .similarity import l2_normalize

    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    cent = F.element_at(cent_arr, cluster_col + 1)
    return F.zip_with(l2_normalize(vec), cent, lambda a, b: a - b)


def ivfpq_train(
    corpus: DataFrame,
    k_coarse: int = 8,
    m: int = 8,
    k_pq: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list, list]:
    """-> ``(centroids, codebooks)``: the spherical coarse quantizer
    (``similarity.ivf_train_lloyd``) plus PQ codebooks trained on the
    coarse RESIDUALS — Jégou et al.'s IVFADC layout. Both trainers are
    the deterministic fixed-point Lloyd, so the whole index is
    engine-portable."""
    from .similarity import ivf_assign, ivf_train_lloyd

    cents = ivf_train_lloyd(corpus, k=k_coarse, iters=iters,
                            id_col=id_col, vec_col=vec_col)
    tagged = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)
    residuals = tagged.select(
        "vec_id",
        _residual(F.col("emb"), cents, F.col("cluster")).alias("r"),
    )
    books = pq_train_lloyd(residuals, m=m, k=k_pq, iters=iters,
                           id_col="vec_id", vec_col="r")
    return cents, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> ``(vec_id, cluster, codes)``: coarse assignment + PQ codes of
    the residual. One narrow map; this is the stored index relation
    (bucket by ``cluster`` at scale)."""
    from .similarity import ivf_assign

    m = len(codebooks)
    d = len(codebooks[0][0])
    tagged = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    r = _residual(F.col("emb"), centroids, F.col("cluster"))
    return tagged.select(
        "vec_id", "cluster",
        F.array(*[_cluster_expr(r, codebooks[mi], mi, d)
                  for mi in range(m)]).alias("codes"),
    )


def ivfpq_topk(
    encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC search: probe the ``n_probe`` nearest coarse clusters per
    query (score desc, cluster desc tie-break — the ``ivf_topk``
    convention), build the ADC tables against the QUERY RESIDUAL of
    each probed centroid, and rank codes within probed clusters only.
    The scan touches ~n_probe/k_coarse of the CODES (not the vectors).
    -> ``(query_id, vec_id, adist, rank)``."""
    from .similarity import dot as _dot
    from .similarity import l2_normalize

    m = len(codebooks)
    d = len(codebooks[0][0])
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c])
                         for c in centroids])
    qn = l2_normalize(F.col(vec_col))
    scores = F.transform(cent_arr, lambda c: _dot(qn, c))
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            F.slice(
                F.reverse(F.array_sort(
                    F.transform(
                        scores,
                        lambda s, i: F.struct(s.alias("score"),
                                              i.alias("cluster")),
                    )
                )),
                1, n_probe,
            )
        ).alias("_p"),
    ).select("query_id", "_qv",
             F.col("_p.cluster").cast("int").alias("cluster"))

    qr = _residual(F.col("_qv"), centroids, F.col("cluster"))

    def _table(mi: int):
        cb = F.array(*[F.array(*[F.lit(x) for x in c])
                       for c in codebooks[mi]])
        return F.transform(
            cb, lambda c: _sqdist(_sub(qr, mi, d), c)).alias(f"t{mi}")

    q = probes.select("query_id", "cluster",
                      *[_table(mi) for mi in range(m)])
    joined = encoded.join(F.broadcast(q), "cluster")
    adist = F.element_at(F.col("t0"),
                         F.element_at("codes", 1).cast("int") + 1)
    for mi in range(1, m):
        adist = adist + F.element_at(
            F.col(f"t{mi}"), F.element_at("codes", mi + 1).cast("int") + 1)
    scored = joined.select(
        "query_id", "vec_id", F.round(adist, 6).alias("adist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
