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

from .similarity import bind, dot

__all__ = ["pq_train_lloyd", "pq_encode", "pq_topk",
           "ivfpq_train", "ivfpq_encode", "ivfpq_topk"]


def _as_double(vec_col):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _py_dot(a: list[float], b: list[float]) -> float:
    """Driver-side twin of ``similarity.dot``'s left-assoc fold —
    ``((0 + a0*b0) + a1*b1) + ...`` in IEEE doubles, so a literal
    codeword's self-dot computed here is bit-identical to evaluating
    ``dot(c, c)`` over the literal at runtime."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _sqdist(a, b):
    """Squared L2 via the dot expansion — the one shape both engines
    evaluate identically (each dot a left-assoc fold)."""
    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def _sub(vec, m: int, d: int):
    return F.slice(vec, m * d + 1, d)


# --- SQL-string expression generators ---------------------------------------
# The PQ expressions embed codebooks as literals. Built with per-element
# ``F.lit``/HOF Column calls, ONE cluster-argmin costs ~900 py4j
# round-trips (profiled: the nested-list lit recurses into per-element
# lits, and every lambda is several JVM calls) — at m=8, k=8 the
# DRIVER-side plan construction dominated the whole ann_pq bench stage.
# Generating the identical expression as a single SQL string hands the
# parse to the JVM in one round-trip. Semantics are unchanged node for
# node: ``xD`` double literals round-trip exactly via repr (shortest
# repr -> Double.parseDouble), CAST/zip_with/aggregate/transform parse
# to the same Catalyst nodes the Column API builds, and the
# ``_py_dot``-precomputed ``dot(c,c)`` literals plus the let-bindings
# (``element_at(transform(array(x), v -> body), 1)``) only drop
# evaluation counts, never values (see similarity.bind).


def _sql_d(x: float) -> str:
    return repr(float(x)) + "D"


def _sql_arr(xs: list[float]) -> str:
    return "array(" + ", ".join(_sql_d(x) for x in xs) + ")"


def _sql_arr2(cb: list[list[float]]) -> str:
    return "array(" + ", ".join(_sql_arr(c) for c in cb) + ")"


def _sql_dot(a: str, b: str) -> str:
    """SQL twin of ``similarity.dot`` (zip_with + left-assoc aggregate)."""
    return (
        f"aggregate(zip_with({a}, {b}, (zx, zy) -> CAST(zx AS DOUBLE) * "
        f"CAST(zy AS DOUBLE)), 0.0D, (zacc, zv) -> zacc + zv)"
    )


def _sql_bind(value: str, var: str, body: str) -> str:
    """SQL twin of ``similarity.bind`` — let-evaluate ``value`` once."""
    return f"element_at(transform(array({value}), {var} -> {body}), 1)"


def _sql_cast_double(vec: str) -> str:
    """SQL twin of ``_as_double``."""
    return f"transform({vec}, cx -> CAST(cx AS DOUBLE))"


def _sql_dist_table(sub: str, codebook_m: list[list[float]]) -> str:
    """Per-codeword table ``[_sqdist(sub, c_j)]_j``: ``a2 - 2<a,c> + c2``
    with ``a`` and ``a2`` let-bound (one evaluation each instead of k)
    and ``c2`` the Python-precomputed literal fold."""
    cbs = _sql_arr2(codebook_m)
    c2s = _sql_arr([_py_dot(c, c) for c in codebook_m])
    inner = (
        f"transform({cbs}, (cw, ci) -> a2v - 2 * {_sql_dot('av', 'cw')}"
        f" + element_at({c2s}, ci + 1))"
    )
    return _sql_bind(sub, "av",
                     _sql_bind(_sql_dot("av", "av"), "a2v", inner))


def _sql_cluster(sub: str, codebook_m: list[list[float]]) -> str:
    """FIRST-index argmin of squared L2 to the sub-space codewords; the
    distance table is let-bound so ``array_position(ds, array_min(ds))``
    evaluates it once, not twice."""
    return _sql_bind(
        _sql_dist_table(sub, codebook_m), "dsv",
        "CAST(array_position(dsv, array_min(dsv)) - 1 AS INT)",
    )


def _cluster_expr(vec_sql: str, codebook_m: list[list[float]],
                  m: int, d: int):
    """Column form of the argmin over a SQL vector reference."""
    return F.expr(_sql_cluster(f"slice({vec_sql}, {m * d + 1}, {d})",
                               codebook_m))


def _sql_l2_normalize(vec: str) -> str:
    """SQL twin of ``similarity.l2_normalize`` (bound norm, zero vectors
    pass through as plain double casts)."""
    norm = (
        f"sqrt(aggregate(transform({vec}, nx -> CAST(nx AS DOUBLE) * "
        f"CAST(nx AS DOUBLE)), 0.0D, (nacc, nv) -> nacc + nv))"
    )
    return _sql_bind(
        norm, "nrm",
        f"CASE WHEN nrm > 0 THEN transform({vec}, dx -> "
        f"CAST(dx AS DOUBLE) / nrm) ELSE transform({vec}, dx -> "
        f"CAST(dx AS DOUBLE)) END",
    )


def _sql_residual(vec: str, cluster: str, cents: list[list[float]]) -> str:
    """SQL twin of ``_residual``: normalized(vec) - centroid[cluster]."""
    cent = f"element_at({_sql_arr2(cents)}, {cluster} + 1)"
    return (f"zip_with({_sql_l2_normalize(vec)}, {cent}, "
            f"(ra, rb) -> ra - rb)")


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
    # one job probes the dimension AND fetches the seed vectors (the
    # separate limit(1) dim probe was a whole extra Spark job)
    seed_rows = v.orderBy("vec_id").limit(k).collect()
    if not seed_rows:
        raise ValueError("pq_train_lloyd: empty corpus")
    dim = len(seed_rows[0]["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} codewords")
    books = [[[float(seed_rows[j]["v"][mi * d + t]) for t in range(d)]
              for j in range(k)] for mi in range(m)]
    for _ in range(iters):
        # one job assigns EVERY sub-space: rows (m, cluster, j, fx)
        parts = []
        for mi in range(m):
            cl = _cluster_expr("v", books[mi], mi, d)
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
    # let-bind the double-cast vector: referenced by every sub-space's
    # argmin it would otherwise re-cast the full array m (or m*k) times
    codes = F.expr(_sql_bind(
        _sql_cast_double(f"`{vec_col}`"), "vv",
        "array(" + ", ".join(
            _sql_cluster(f"slice(vv, {mi * d + 1}, {d})", codebooks[mi])
            for mi in range(m)
        ) + ")",
    ))
    return corpus.select(
        F.col(id_col).alias("vec_id"), codes.alias("codes"),
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

    # one bound double-cast of the query vector feeds all m ADC tables
    # (same _sqdist values; see _sql_dist_table for the fold accounting)
    all_tables = F.expr(_sql_bind(
        _sql_cast_double(f"`{vec_col}`"), "qvv",
        "struct(" + ", ".join(
            _sql_dist_table(f"slice(qvv, {mi * d + 1}, {d})",
                            codebooks[mi]) + f" AS t{mi}"
            for mi in range(m)
        ) + ")",
    ))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), all_tables.alias("_ts")
    ).select("query_id", *[F.col(f"_ts.t{mi}").alias(f"t{mi}")
                           for mi in range(m)])
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

    cent_arr = F.lit([[float(x) for x in c] for c in cents])
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
    # let-bind the residual: it embeds an l2_normalize and would be
    # re-evaluated by every sub-space's argmin otherwise
    codes = F.expr(_sql_bind(
        _sql_residual("emb", "cluster", centroids), "rv",
        "array(" + ", ".join(
            _sql_cluster(f"slice(rv, {mi * d + 1}, {d})", codebooks[mi])
            for mi in range(m)
        ) + ")",
    ))
    return tagged.select("vec_id", "cluster", codes.alias("codes"))


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
    m = len(codebooks)
    d = len(codebooks[0][0])
    # bind the normalized query vector: the per-centroid scoring lambda
    # would re-normalize it k_coarse times
    scores = F.expr(_sql_bind(
        _sql_l2_normalize(f"`{vec_col}`"), "qnv",
        f"transform({_sql_arr2(centroids)}, cc -> {_sql_dot('qnv', 'cc')})",
    ))
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

    # one bound query residual feeds all m ADC tables (it embeds an
    # l2_normalize — unbound it would be re-evaluated m*k times)
    all_tables = F.expr(_sql_bind(
        _sql_residual("_qv", "cluster", centroids), "qrv",
        "struct(" + ", ".join(
            _sql_dist_table(f"slice(qrv, {mi * d + 1}, {d})",
                            codebooks[mi]) + f" AS t{mi}"
            for mi in range(m)
        ) + ")",
    ))
    q = probes.select(
        "query_id", "cluster", all_tables.alias("_ts")
    ).select("query_id", "cluster",
             *[F.col(f"_ts.t{mi}").alias(f"t{mi}") for mi in range(m)])
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
