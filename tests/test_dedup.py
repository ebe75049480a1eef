"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.dedup import (
    exact_dedup,
    minhash_candidates,
    minhash_dedup,
    ngram_jaccard,
    simhash_candidates,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
        (2, "completely different content about spark shuffle partitions and skew"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
        (4, "another unrelated document mentioning minhash signatures and bands"),
        (5, "the quick brown fox jumps over the lazy dog near the river bank today"),  # near-dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = {r["doc_id"]: r["canonical_id"] for r in exact_dedup(_docs(spark)).collect()}
    assert out[3] == 0  # exact dup maps to min id
    assert out[0] == 0 and out[1] == 1 and out[2] == 2


def test_minhash_candidates_find_neardups(spark):
    pairs = {(r["a"], r["b"]) for r in minhash_candidates(_docs(spark)).collect()}
    assert (0, 3) in pairs  # identical docs always collide in every band
    assert (0, 1) in pairs or (0, 5) in pairs  # near-dups found
    assert (2, 4) not in pairs  # unrelated docs don't collide


def test_ngram_jaccard_exact_values(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame([(0, 3), (0, 2)], "a long, b long")
    out = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard(docs, pairs).collect()}
    assert out[(0, 3)] == 1.0  # identical
    assert out[(0, 2)] == 0.0  # disjoint


def test_minhash_dedup_mapping_total_and_clustered(spark):
    docs = _docs(spark)
    mapping = {r["doc_id"]: r["canonical_id"] for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert set(mapping) == {0, 1, 2, 3, 4, 5}  # total over ids
    assert mapping[3] == mapping[0]  # exact dup clustered
    assert mapping[2] == 2 and mapping[4] == 4  # singletons keep themselves


def test_incremental_minhash_equals_filtered_full(spark):
    """candidates(old ∪ new) restricted to pairs touching a new doc ==
    incremental(new, index(old)) — the decomposition the 100 TB
    crawl-vs-corpus path relies on."""
    from sigraph_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_index,
    )

    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = minhash_index(old)
    pairs, delta = incremental_minhash_candidates(new, idx)
    got = sorted(map(tuple, pairs.collect()))
    full = minhash_candidates(docs)
    want = sorted(
        (r["a"], r["b"])
        for r in full.collect()
        if r["a"] % 2 == 1 or r["b"] % 2 == 1
    )
    assert got == want
    # delta index rows == index built over new docs directly
    assert sorted(map(tuple, delta.collect())) == sorted(
        map(tuple, minhash_index(new).collect())
    )


def test_incremental_minhash_appended_index_closes_loop(spark):
    """After appending the delta index, a second snapshot sees the first
    snapshot's docs as corpus: running increment twice == one big run."""
    from sigraph_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_index,
    )

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") <= 1)
    snap1 = docs.filter((F.col("doc_id") >= 2) & (F.col("doc_id") <= 3))
    snap2 = docs.filter(F.col("doc_id") >= 4)
    idx = minhash_index(base)
    p1, d1 = incremental_minhash_candidates(snap1, idx)
    p2, d2 = incremental_minhash_candidates(snap2, idx.unionByName(d1))
    got = sorted(map(tuple, p1.unionByName(p2).distinct().collect()))
    base_pairs = {tuple(r) for r in minhash_candidates(base).collect()}
    want = sorted(
        tuple(r)
        for r in minhash_candidates(docs).collect()
        if tuple(r) not in base_pairs
    )
    assert got == want


def test_simhash_pairs(spark):
    pairs = {(r["a"], r["b"]) for r in simhash_candidates(_docs(spark), max_hamming=3).collect()}
    assert (0, 3) in pairs  # identical => hamming 0
    assert (2, 4) not in pairs


def test_dedup_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, minhash_candidates(docs.repartition(1)).collect()))
    b = sorted(map(tuple, minhash_candidates(docs.repartition(7)).collect()))
    assert a == b


def test_minhash_udf_matches_column_formulation(spark):
    """The numpy kernel and the pure-Column expression compute the SAME
    signature family bit-for-bit (crc32 shingles, (a*h+b) mod p)."""
    from pyspark.sql import functions as F

    from sigraph_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_udf,
        shingle_hashes,
    )

    docs = _docs(spark)
    a = {
        r["doc_id"]: list(r["s"])
        for r in docs.select(
            "doc_id",
            minhash_signature(shingle_hashes(F.col("text"), 3), 64).alias("s"),
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["s"])
        for r in docs.select(
            "doc_id", minhash_signature_udf(3, 64)(F.col("text")).alias("s")
        ).collect()
    }
    assert a == b


def test_simhash_single_shingle_sig_is_hash_bits():
    """A one-shingle doc's signature must be EXACTLY the shingle's hash
    bits (votes are +-1 per bit). Regression: the uint8 bit-column sum
    promotes to uint64, where `sum*2 - n` wraps negative votes to huge
    positives and sets every non-tied bit — caught by the DuckDB oracle."""
    import hashlib

    import pandas as pd

    from sigraph_spark.operators.dedup import _simhash_batch_factory

    text = "alpha beta"  # < 3 words -> single shingle "alpha beta"
    for family, digest in (
        ("md5", lambda s: hashlib.md5(s).digest()[:8]),
        ("blake2b", lambda s: hashlib.blake2b(s, digest_size=8).digest()),
    ):
        sig = int(_simhash_batch_factory(family)(pd.Series([text])).iloc[0])
        expected = int.from_bytes(digest(text.encode()), "little")
        assert sig & 0xFFFFFFFFFFFFFFFF == expected, family


def test_minhash_md5_family_matches_column_formulation(spark):
    """The md5 hash family (engine-portable, used by the driver-gate
    oracle) is bit-identical between the numpy kernel and the pure-Column
    hash32_md5_le formulation."""
    from sigraph_spark.operators.dedup import (
        hash32_md5_le,
        minhash_signature,
        minhash_signature_udf,
        shingle_hashes,
    )

    docs = _docs(spark)
    col_form = docs.select(
        "doc_id",
        minhash_signature(shingle_hashes(F.col("text"), 3, family="md5"), 64).alias("s"),
    )
    udf_form = docs.select(
        "doc_id", minhash_signature_udf(3, 64, family="md5")(F.col("text")).alias("s")
    )
    a = {r["doc_id"]: r["s"] for r in col_form.collect()}
    b = {r["doc_id"]: r["s"] for r in udf_form.collect()}
    assert a == b

    # and the Column hash itself matches hashlib little-endian uint32
    import hashlib

    val = docs.select(hash32_md5_le(F.lit("alpha beta gamma")).alias("h")).first()["h"]
    assert val == int.from_bytes(hashlib.md5(b"alpha beta gamma").digest()[:4], "little")


def test_incremental_exact_dedup_statuses(spark):
    """corpus_dup / batch_dup / new classification with deterministic
    canonicals, and the 'new' rows are exactly the index delta."""
    from sigraph_spark.operators.dedup import (
        exact_hash_index,
        incremental_exact_dedup,
    )

    corpus = spark.createDataFrame(
        [(0, "known content"), (1, "other content")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [
            (10, "known content"),   # already in corpus -> corpus_dup of 0
            (11, "fresh content"),   # new
            (12, "fresh content"),   # dup within batch -> batch_dup of 11
            (13, "also fresh"),      # new
        ],
        "doc_id long, text string",
    )
    idx = exact_hash_index(corpus)
    out = {
        r["doc_id"]: (r["status"], r["canonical_id"])
        for r in incremental_exact_dedup(delta, idx).collect()
    }
    assert out == {
        10: ("corpus_dup", 0),
        11: ("new", 11),
        12: ("batch_dup", 11),
        13: ("new", 13),
    }
    # appending the 'new' rows' hashes makes a replayed batch all dups
    classified = incremental_exact_dedup(delta, idx)
    new_rows = classified.filter(classified["status"] == "new").select(
        classified["doc_id"].alias("id"), "content_hash"
    )
    idx2 = idx.unionByName(new_rows)
    replay = {
        r["doc_id"]: r["status"]
        for r in incremental_exact_dedup(delta, idx2).collect()
    }
    assert set(replay.values()) == {"corpus_dup"}


def test_incremental_simhash_equals_full_filtered(spark):
    # band independence: incremental(new, index(old)) must equal the
    # full-corpus pair set restricted to pairs touching a new doc
    from pyspark.sql import functions as F

    from sigraph_spark.operators.dedup import (
        incremental_simhash_candidates,
        simhash_candidates,
        simhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(40):
        words = base.split()
        if i % 5 == 0:
            words[i % len(words)] = f"tok{i}"  # near-dup of the base
        elif i % 5 == 1:
            words = [f"u{i}w{j}" for j in range(12)]  # unique doc
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    full = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_candidates(docs, hash_family="md5").collect()
    }
    expected = {t for t in full if t[0] % 4 == 0 or t[1] % 4 == 0}
    pairs, delta = incremental_simhash_candidates(
        new, simhash_index(old, hash_family="md5"), hash_family="md5"
    )
    got = {(r["a"], r["b"], r["hamming"]) for r in pairs.collect()}
    assert got == expected and expected  # non-trivial fixture
    # appending the delta makes the next snapshot see new docs as corpus
    merged = simhash_index(old, hash_family="md5").unionByName(delta)
    assert merged.count() == docs.count() * 4
