"""S3: entity linking & canonicalization.

Stage layout (north_star):

1. **Normalize** (exact unification, reference ``ai_agent.py:389-403``):
   lowercase + trim + defang ``[.]`` -> ``.`` — pure Column expressions.
2. **Block** candidate near-duplicate pairs with MinHash-LSH over character
   3-gram shingles (Spark ML ``MinHashLSH``; shingling itself is a Column
   ``transform``/``sequence`` expression — no Python).
3. **Score** candidates with TF-IDF cosine (``HashingTF`` + ``IDF`` +
   ``Normalizer``; the dot product over the LSH-pruned pair set is an
   Arrow-batched pandas UDF — the pair set is tiny relative to the corpus).
4. **Canonicalize** with connected components over the match edges
   (alternating large-star/small-star contraction over DataFrames —
   GraphFrames-free, deterministic: the canonical id is the lexicographic
   minimum of each component; O(log n) rounds regardless of component
   diameter).

Scale notes: LSH banding bounds the candidate-pair explosion to near-linear;
star contraction converges in O(log n) rounds even on giant high-diameter
components (web boilerplate chains); each round localCheckpoints to
truncate lineage. Skewed head entities (one hot URL in 30% of triples)
never blow up: linking runs over the **distinct entity vocabulary**, not
over triple instances.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sparse_dot_batch(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched sparse-vector dot product (normalized inputs ->
    cosine). The pair set is LSH-pruned, so this Python path sees only a
    tiny fraction of the corpus."""
    return pd.Series([float(x.dot(y)) for x, y in zip(va, vb)])


def _sparse_dot_udf():
    return F.pandas_udf(_sparse_dot_batch, "double")


def normalize_entity(c: Column) -> Column:
    """Exact unification (ai_agent.py:389-403): lower, strip, re-fang.

    ``replace`` is literal (not regex) — defanged IoCs like
    ``evil[.]example`` become ``evil.example``.
    """
    return F.replace(F.lower(F.trim(c)), F.lit("[.]"), F.lit("."))


def remove_lucene_chars(c: Column) -> Column:
    """Predicate sanitation (ai_agent.py:378, langchain-neo4j charset):
    ``+ - && || ! ( ) { } [ ] ^ " ~ * ? : \\ /`` -> space."""
    return F.trim(F.regexp_replace(c, r'[+\-&|!(){}\[\]^"~*?:\\/]', " "))


def char_shingles(c: Column, k: int = 3) -> Column:
    """Character k-gram shingle array as a pure Column expression; short
    strings fall back to the whole string as a single shingle.

    Zip-shift construction (arrays_zip of k shifted char slices) rather
    than ``transform(sequence(i), substring(c, i, k))`` — the indexed
    lambda drops to interpreted per-element eval (see dedup._word_grams).
    """
    chars = F.split(c, "")
    cnt = F.size(chars) - (k - 1)
    shifted = [F.slice(chars, j + 1, cnt).alias(f"c{j}") for j in range(k)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws("", *[s[f"c{j}"] for j in range(k)]),
    )
    return F.when(F.length(c) < k, F.array(c)).otherwise(F.array_distinct(grams))


def entity_vocab(triples: DataFrame) -> DataFrame:
    """Distinct normalized entity strings from actor + object columns."""
    ents = (
        triples.select(normalize_entity(F.col("actor")).alias("entity"))
        .unionAll(triples.select(normalize_entity(F.col("object")).alias("entity")))
        .filter(F.col("entity") != "")
        .distinct()
    )
    return ents


def candidate_pairs(
    entities: DataFrame,
    jaccard_dist: float = 0.4,
    num_hash_tables: int = 6,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH blocking over char-3-gram shingles -> (a, b) candidate
    pairs with a < b. Deterministic for a fixed seed."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = entities.select("entity", char_shingles(F.col("entity")).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features)
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, jaccard_dist, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.entity").alias("a"),
            F.col("datasetB.entity").alias("b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def tfidf_cosine_scores(
    entities: DataFrame,
    pairs: DataFrame,
    num_features: int = 1 << 18,
) -> DataFrame:
    """TF-IDF cosine over char-3-gram shingle counts for the LSH-pruned
    pairs. Returns (a, b, cosine)."""
    from pyspark.ml.feature import IDF, HashingTF, Normalizer

    sh = entities.select("entity", char_shingles(F.col("entity")).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="tf", numFeatures=num_features)
    tfed = tf.transform(sh)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tfed)
    vecs = Normalizer(inputCol="tfidf", outputCol="norm", p=2.0).transform(
        idf_model.transform(tfed)
    )
    # sparse dot product via posexplode of the dense form would be wasteful;
    # join both sides and compute with zip_with over sparse indices/values
    # materialized as maps. The pair set is LSH-pruned, so this join is the
    # cheap part; broadcast when small.
    lhs = vecs.select(F.col("entity").alias("a"), F.col("norm").alias("va"))
    rhs = vecs.select(F.col("entity").alias("b"), F.col("norm").alias("vb"))
    joined = pairs.join(lhs, "a").join(rhs, "b")
    return joined.select("a", "b", _sparse_dot_udf()("va", "vb").alias("cosine"))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star operation (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node attaches its strictly-larger
    neighbors to its minimum neighborhood member. One min-agg (algebraic,
    map-side partial) + one equi-join."""
    nbrs = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("_mv"), F.col("u")).alias("m"))
    )
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star operation: orient edges toward the smaller endpoint, then
    every node attaches itself and its smaller neighbors to the minimum."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    attached = (
        o.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfed = mins.select("u", F.col("m").alias("v"))
    return attached.unionAll(selfed).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    metrics: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components (SURVEY.md
    §4-custom-1; Kiveris et al. 2014). Deterministic: the canonical id is
    the minimum node id of the component.

    Why not min-label propagation: propagation converges in O(component
    diameter) rounds, and web-scale near-dup graphs grow giant HIGH-diameter
    components (boilerplate chains) — a 10^6-long chain would need 10^6
    shuffles. Star contraction converges in O(log n) rounds regardless of
    diameter, each round two algebraic min-aggregations + joins whose keys
    are spread across the component (no single hub groupBy). One driver job
    per round checks convergence (edge set unchanged). Pass ``metrics`` to
    capture {rounds, edges_final} for the stage manifest.

    The previous propagation routine is kept as
    ``connected_components_propagation`` (fast path for known-shallow
    graphs; equality pinned in tests)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = e.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # converged when the canonical edge set is unchanged. Both sides
        # are distinct sets, so |A| == |B| and A\B == ∅ imply A == B —
        # one count (on checkpointed data) + ONE exceptAll, not two.
        n_new = e2.count()
        changed = (
            1 if n_new != n_prev else e2.exceptAll(e).limit(1).count()
        )
        e, n_prev = e2, n_new
        if changed == 0:
            break
    if metrics is not None:
        metrics["rounds"] = rounds
        metrics["edges_final"] = e.count()
    # at convergence e is a star forest (child -> component min); roots
    # label themselves
    children = e.select(F.col("u").alias("entity"), F.col("v").alias("canonical_id"))
    roots = e.select(F.col("v").alias("entity"), F.col("v").alias("canonical_id")).distinct()
    return children.unionByName(roots).distinct()


def connected_components_propagation(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation (legacy r1 routine): O(component diameter)
    rounds — fine for known-shallow match graphs, replaced by star
    contraction as the default. Kept for cross-checking."""
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .unionAll(edges.select(F.col(dst).alias("x"), F.col(src).alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.y == labels.node)
            .groupBy("x")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.x, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("entity"), F.col("label").alias("canonical_id"))


def link_entities(
    triples: DataFrame,
    cosine_threshold: float = 0.85,
    jaccard_dist: float = 0.4,
) -> DataFrame:
    """Full S3: triples -> (entity, canonical_id) mapping.

    Entities with no near-duplicate keep themselves as canonical id (the
    mapping is total over the vocabulary).
    """
    vocab = entity_vocab(triples).localCheckpoint(eager=True)
    pairs = candidate_pairs(vocab, jaccard_dist=jaccard_dist)
    scored = tfidf_cosine_scores(vocab, pairs)
    matches = scored.filter(F.col("cosine") >= cosine_threshold).select("a", "b")
    cc = connected_components(matches)
    return (
        vocab.join(cc, "entity", "left")
        .select(
            "entity",
            F.coalesce(F.col("canonical_id"), F.col("entity")).alias("canonical_id"),
        )
    )


def canonicalize_triples(
    triples: DataFrame,
    mapping: DataFrame,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Rewrite triples onto canonical entity ids (provenance columns kept).

    Two equi-joins against the mapping. The mapping is the DISTINCT ENTITY
    VOCABULARY — at web scale (10^12 docs) that is billions of rows, so a
    forced ``F.broadcast`` would OOM the driver. Default: NO hint — AQE
    picks broadcast at runtime when the built side is actually small, and
    falls back to a shuffled hash join otherwise (both sides shuffle on the
    same entity key, so the two joins reuse one exchange of the mapping).
    Pass ``broadcast_max_rows`` to opt in to a size-guarded explicit hint
    (one cheap count against a known-tiny vocabulary).
    """
    m_actor = mapping.select(
        F.col("entity").alias("_na"), F.col("canonical_id").alias("subj")
    )
    m_obj = mapping.select(
        F.col("entity").alias("_no"), F.col("canonical_id").alias("obj")
    )
    if broadcast_max_rows is not None and (
        mapping.limit(broadcast_max_rows + 1).count() <= broadcast_max_rows
    ):
        m_actor, m_obj = F.broadcast(m_actor), F.broadcast(m_obj)
    return (
        triples.withColumn("_na", normalize_entity(F.col("actor")))
        .withColumn("_no", normalize_entity(F.col("object")))
        .join(m_actor, "_na", "left")
        .join(m_obj, "_no", "left")
        .withColumn("subj", F.coalesce("subj", "_na"))
        .withColumn("obj", F.coalesce("obj", "_no"))
        .drop("_na", "_no")
    )
