"""Similarity search over embedding columns (array<float>).

Two paths (driver brief: ANN is a first-class 100 TB component):

* **Brute-force cosine top-k** — the correctness baseline: normalize,
  cross-join query x corpus, zip_with dot product, window top-k. All
  JVM-side Column expressions (no UDF); for a broadcast-sized query set
  the corpus never shuffles — the plan is scan -> broadcast-nested-loop ->
  per-query top-k aggregation.
* **Random-hyperplane LSH buckets (IVF-style)** — the scale path: b
  signed projections against fixed deterministic pseudo-random hyperplanes
  put each vector in one of 2^b buckets; queries probe their own bucket
  (plus optional multi-probe neighbors), turning the all-pairs cross join
  into an equi-join on bucket id. Recall is tunable via b and n_probes.

The hyperplanes derive from ``crc32`` of (dim_index, plane_index) — fixed,
seedless, reproducible in any engine, so tests can pin exact bucket ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns — zip_with + aggregate,
    fully codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bind(value: Column, f) -> Column:
    """Let-binding for expression trees: evaluate ``value`` ONCE per row
    and pass the result to ``f`` as a lambda variable.

    Higher-order-function lambdas re-evaluate every captured subtree per
    element (HOFs are interpreted, no common-subexpression elimination),
    so an expensive expression referenced k times inside a ``transform``
    costs k evaluations. ``transform`` over a singleton array evaluates
    its input exactly once and binds it to the lambda variable — same
    values, one evaluation (guide §1.2 "per-task work"). Bit-identical
    by construction: the bound subtree is unchanged, only its
    evaluation count drops."""
    return F.element_at(F.transform(F.array(value), f), 1)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (cosine 0).

    The norm is let-bound (:func:`bind`): referenced from inside the
    per-element ``transform`` lambda it would otherwise be re-folded for
    EVERY element — dim+1 norm evaluations per row instead of one."""
    return bind(
        l2_norm(a),
        lambda n: F.when(
            n > 0, F.transform(a, lambda x: x.cast("double") / n)
        ).otherwise(F.transform(a, lambda x: x.cast("double"))),
    )


def topk_per_query(scored: DataFrame, k: int, salt_buckets: int = 32) -> DataFrame:
    """Two-stage salted per-query top-k over (query_id, vec_id, cosine).

    A single ``Window.partitionBy(query_id)`` funnels EVERY scored row of a
    query into one task — with few queries that is a whole-corpus
    single-task sort that skews/OOMs at scale (ADVICE r1). Instead: rank
    within (query_id, salt) shards (salt = hash of vec_id, so shards are
    uniform), keep k per shard, then rank the <= salt_buckets*k survivors
    per query. Identical output (deterministic (cosine desc, vec_id)
    ordering in both stages); the heavy shuffle spreads over
    ``salt_buckets`` tasks per query and the final per-query sort sees a
    bounded row count."""
    salt = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    local = (
        scored.withColumn("_salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Returns (query_id, vec_id, cosine, rank).

    The query side is broadcast (top-k search is always few-queries ×
    huge-corpus); the corpus side streams through one narrow scoring pass.
    The per-query ranking is the salted two-stage ``topk_per_query`` —
    only ~salt_buckets*k rows per query reach the final sort, so the plan
    has no single-task whole-corpus window. Deterministic tie-break on id.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), l2_normalize(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        l2_normalize(F.col(vec_col)).alias("qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    return topk_per_query(scored, k).select("query_id", "vec_id", "cosine", "rank")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (IVF-style bucketing)
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component d is
    ``crc32(f"{plane}:{d}") / 2^31 - 1`` in [-1, 1). Pure function — same
    plane in every engine/run."""
    import zlib

    return [
        zlib.crc32(f"{plane}:{d}".encode()) / float(1 << 31) - 1.0
        for d in range(dim)
    ]


def lsh_bucket(vec: Column, dim: int, bits: int = 8, plane_offset: int = 0) -> Column:
    """Bucket id in [0, 2^bits): bit i = sign of <vec, plane_{offset+i}>.
    ``plane_offset`` selects an independent hyperplane family — band b of a
    multi-band scheme uses offset b*bits."""
    acc = F.lit(0)
    for i in range(bits):
        plane = F.array(*[F.lit(w) for w in _hyperplane(dim, plane_offset + i)])
        acc = acc + F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def lsh_buckets_udf(dim: int, bits: int, bands: int = 1):
    """Arrow-batched multi-band bucket ids: ONE ``(batch x dim) @ (dim x
    bands*bits)`` matmul + sign + bit-pack per batch — the scale path.
    The per-band Column form (``lsh_bucket``) unrolls bands*bits separate
    64-wide aggregate trees, which blows janino's 64KB method limit past
    ~8 planes and drops whole-stage codegen to interpreted eval (same
    cliff as the MinHash signature tree; measured ~0.7ms/vector vs
    microseconds here). Signs are scale-invariant, so the raw (un-
    normalized) vectors feed the matmul; bit i = <v, plane> >= 0 exactly
    as the Column form. Returns ``array<int>`` of ``bands`` bucket ids.
    """
    import numpy as np
    import pandas as pd

    planes = np.array(
        [
            [_hyperplane(dim, b * bits + i) for i in range(bits)]
            for b in range(bands)
        ],
        dtype=np.float64,
    )  # bands x bits x dim
    M = planes.reshape(bands * bits, dim).T  # dim x (bands*bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    def batch(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # n x dim
        S = (V @ M) >= 0.0  # n x bands*bits
        B = S.reshape(len(V), bands, bits).astype(np.int64) @ weights
        return pd.Series([row.tolist() for row in B.astype(np.int32)])

    return F.pandas_udf(batch, "array<int>")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_kernel: str = "numpy",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. The cross join becomes an equi-join on ``bucket`` — at 10^12
    vectors with bits=16 each query touches ~|corpus|/65536 rows.

    ``bucket_kernel``: "numpy" (default, Arrow matmul — see
    ``lsh_buckets_udf``) or "column" (pure-Column unrolled dots — the
    SQL-oracle-parity form; tests pin numpy == column on real data).

    Returns (query_id, vec_id, cosine, rank) — same shape as brute force so
    recall is measurable by direct comparison.
    """
    if bucket_kernel == "numpy":
        bk = lambda: F.element_at(  # noqa: E731
            lsh_buckets_udf(dim, bits, 1)(F.col(vec_col)), 1
        ).cast("int")
    else:
        bk = lambda: lsh_bucket(l2_normalize(F.col(vec_col)), dim, bits)  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        l2_normalize(F.col(vec_col)).alias("cv"),
        bk().alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        l2_normalize(F.col(vec_col)).alias("qv"),
        bk().alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id", dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    return topk_per_query(scored, k).select("query_id", "vec_id", "cosine", "rank")


def embedding_neardup_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 8,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_kernel: str = "numpy",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold — the SCALE path for
    operators.dedup.embedding_neardup (which stays as the brute-force
    recall oracle). Multi-band random-hyperplane LSH: ``bands`` independent
    ``bits``-bit bucketings; any pair agreeing in at least one band becomes
    a candidate (pair generation is an equi-join on (band, bucket), never
    all-pairs), then exact cosine verifies. Per-row first-matching-band
    filter dedups multi-band collisions without a distinct() shuffle (same
    trick as dedup.simhash_candidates). Recall rises with ``bands`` and
    falls with ``bits``; measure against the brute-force oracle on a
    sample (tests pin >= 0.9 on planted near-dups).

    ``bucket_kernel``: "numpy" (one matmul for all bands*bits planes —
    see ``lsh_buckets_udf``) or "column" (unrolled dots, SQL-oracle
    parity; bands*bits Column aggregates exceed janino's method limit
    and drop to interpreted eval — keep for small verification runs).

    Returns (a, b, cosine) with a < b — same shape as the brute path.
    """
    if bucket_kernel == "numpy":
        bks_col = lsh_buckets_udf(dim, bits, bands)(F.col(vec_col))
    else:
        bks_col = F.array(*[
            lsh_bucket(l2_normalize(F.col(vec_col)), dim, bits, plane_offset=b * bits)
            for b in range(bands)
        ])
    v = emb.select(
        F.col(id_col).alias("id"),
        l2_normalize(F.col(vec_col)).alias("v"),
        bks_col.alias("bks"),
    )
    banded = v.select(
        "id", "v", "bks",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.element_at("bks", b + 1).alias("bucket"))
                for b in range(bands)
            ])
        ).alias("_bk"),
    ).select("id", "v", "bks", F.col("_bk.band").alias("band"), F.col("_bk.bucket").alias("bucket"))
    # the banded table feeds BOTH self-join legs; its upstream holds the
    # bucket kernel (an opaque pandas UDF on the numpy path) plus the
    # normalization, which aliased legs would re-run over the whole
    # corpus (no exchange reuse across opaque subplans — the
    # dedup/media-plane lesson). One lazy materialization serves both.
    banded = banded.localCheckpoint(eager=False)
    a = banded.select("band", "bucket", F.col("id").alias("a"),
                      F.col("v").alias("va"), F.col("bks").alias("bksa"))
    b = banded.select("band", "bucket", F.col("id").alias("b"),
                      F.col("v").alias("vb"), F.col("bks").alias("bksb"))
    first_match = F.array_position(
        F.zip_with("bksa", "bksb", lambda x, y: x == y), F.lit(True)
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("band") == first_match - 1)
        .withColumn("cosine", dot(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def topk_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall of an approximate top-k against the exact top-k —
    the measurement harness for tuning bits/probes (no silent caps)."""
    e = exact.select("query_id", "vec_id")
    a = approx.select("query_id", F.col("vec_id").alias("hit_id"))
    hits = e.join(
        a, (e.query_id == a.query_id) & (e.vec_id == a.hit_id), "left_semi"
    )
    tot = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    got = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return tot.join(got, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")).alias("recall"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cluster probing
# ---------------------------------------------------------------------------

def ivf_index(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means (Spark ML, fixed seed) coarse quantizer;
    returns (corpus tagged with ``cluster``, centroid list).

    At 10^12 vectors the assign step is one narrow pass and the clustered
    table is written partitioned by ``cluster`` so a probe reads only its
    lists (partition pruning)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        array_to_vector(l2_normalize(F.col(vec_col))).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(vecs)
    tagged = model.transform(vecs).select(
        "vec_id", F.col("emb"), F.col("prediction").alias("cluster")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return tagged, centroids


def ivf_train_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 24,
) -> list[list[float]]:
    """Deterministic spherical k-means (Lloyd) coarse-quantizer
    training, engine-portable by construction — the ``ivf_topk`` gate
    oracle unrolls these exact iterations as chained SQL CTEs:

    * seeds: the L2-normalized vectors of the ``k`` smallest ids;
    * assign: argmax_j <v, c_j>, FIRST index wins ties;
    * update: per-dimension sums in FIXED-POINT integers
      (``floor(v_j * scale)`` summed as BIGINT — order-independent, so
      either engine may aggregate in any order), then mean =
      ``s_j / (scale * n)`` and L2-normalization computed driver-side
      with left-to-right accumulation (matching SQL's left-assoc
      chains; all inputs < 2^53 so the doubles are identical);
      empty/zero-norm clusters keep their previous centroid.

    The driver holds only ``k x dim`` floats per round (the BPE/TransE
    driver-argmax pattern); each iteration is one narrow map + one
    k-key groupBy with map-side partial aggregation. At 10^12 vectors
    you train on a sample and freeze the centroids (``ivf_assign``) —
    this IS that offline trainer, minus the sampling. Spark ML's
    KMeans (``ivf_index``) remains the convenience path where
    cross-engine determinism is not required."""
    import math

    v = corpus.select(
        F.col(id_col).alias("vec_id"),
        l2_normalize(F.col(vec_col)).alias("v"),
    )
    seed_rows = v.orderBy("vec_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} clusters")
    cents = [[float(x) for x in r["v"]] for r in seed_rows]
    dim = len(cents[0])
    for _ in range(iters):
        cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
        scores = F.transform(cent_arr, lambda c: dot(F.col("v"), c))
        assigned = v.select(
            "v",
            (F.array_position(scores, F.array_max(scores)) - 1)
            .cast("int").alias("cluster"),
        )
        stats = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor(F.get("v", j) * F.lit(scale)).cast("long")
                ).alias(f"s{j}")
                for j in range(dim)
            ],
        ).collect()
        new_cents = [list(c) for c in cents]
        for r in stats:
            n = int(r["n"])
            m = [r[f"s{j}"] / (scale * n) for j in range(dim)]
            norm2 = 0.0
            for x in m:
                norm2 = norm2 + x * x
            if norm2 > 0:
                nrm = math.sqrt(norm2)
                new_cents[int(r["cluster"])] = [x / nrm for x in m]
        cents = new_cents
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max <normalized vec,
    centroid>, first index wins ties) from a FIXED literal centroid list —
    the deterministic quantizer for the standard at-scale IVF deployment:
    train k-means on a sample offline, freeze the centroids, assign the
    full corpus with pure Column arithmetic (no ML pass, no shuffle).
    Same output shape as the ``ivf_index`` tagging, so ``ivf_topk``
    consumes either."""
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    uv = l2_normalize(F.col(vec_col))
    scores = F.transform(cent_arr, lambda c: dot(uv, c))
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        (F.array_position(scores, F.array_max(scores)) - 1).cast("int").alias("cluster"),
    )


def ivf_topk(
    tagged: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe the ``n_probe`` nearest clusters per query and rank exact
    cosine inside them. The probe assignment is computed as Column
    expressions against the (tiny, literal) centroid list — no second
    k-means pass; the scan touches ~n_probe/k of the corpus.

    Returns (query_id, vec_id, cosine, rank) — comparable to
    brute_force_topk for recall measurement."""
    cent_arr = F.array(*[
        F.array(*[F.lit(x) for x in c]) for c in centroids
    ])
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        l2_normalize(F.col(vec_col)).alias("qv"),
    )
    # score the query against every centroid; keep the n_probe best
    scored_cents = q.select(
        "query_id", "qv",
        F.transform(cent_arr, lambda c: dot(F.col("qv"), c)).alias("_cs"),
    )
    probes = scored_cents.select(
        "query_id", "qv",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(
                    F.transform(
                        F.col("_cs"),
                        lambda s, i: F.struct(s.alias("score"), i.alias("cluster")),
                    )
                )),
                1, n_probe,
            )
        ).alias("_p"),
    ).select("query_id", "qv", F.col("_p.cluster").alias("cluster"))
    c = tagged.select(
        "vec_id", "cluster", l2_normalize(F.col("emb")).alias("cv")
    )
    scored = c.join(F.broadcast(probes), "cluster").select(
        "query_id", "vec_id", dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    return topk_per_query(scored, k).select("query_id", "vec_id", "cosine", "rank")


def embedding_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid (mean vector) + member count — the class-profile
    aggregate behind cluster audits, nearest-centroid classification, and
    IVF coarse-quantizer refreshes.

    Formulation: posexplode to (label, dim, value), one groupBy on the
    composite (label, dim) key — |labels| x dim groups, uniform, fully
    map-side-combinable (avg is algebraic) — then reassemble the vector
    with a sort-by-dim collect. The reassembly groups on label only, but
    carries just dim rows per label, not members. No UDF anywhere.

    Returns ``(label, n_vectors, centroid: array<double>)`` with 6dp
    rounding so float summation order cannot leak into the hash.
    """
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("m"),
        F.count(F.lit(1)).alias("c"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("c").cast("long").alias("n_vectors"),
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("_dm"),
        )
        .select(
            "label",
            "n_vectors",
            F.transform(F.col("_dm"), lambda s: s["m"]).alias("centroid"),
        )
    )
