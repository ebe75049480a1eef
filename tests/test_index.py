"""Inverted index build + index-backed BM25 retrieval."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sigraph_spark.operators.corpus import bm25_scores
from sigraph_spark.operators.index import (
    build_inverted_index,
    doc_norms,
    search_index,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cat dog cat dog cat"),
    (4, "a lone word"),
    (5, ""),
    (6, "  The   CAT  sat "),
    (7, "unrelated text entirely here"),
]
N_SHARDS = 4


def _shard(doc_id: int) -> int:
    d = hashlib.md5(f"shard:{doc_id}".encode()).digest()
    return int.from_bytes(d[:4], "little") % N_SHARDS


def _py_index():
    idx: dict[tuple[str, int], dict[str, int]] = {}
    for i, t in DOCS:
        ws = [w for w in t.lower().strip().split() if w]
        tf: dict[str, int] = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        s = _shard(i)
        for w, c in tf.items():
            idx.setdefault((w, s), {})[str(i)] = c
    return idx


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_index_matches_python_reference(spark):
    out = build_inverted_index(_df(spark), n_shards=N_SHARDS).collect()
    expect = _py_index()
    got = {
        (r["term"], r["shard"]): {p["doc_id"]: p["tf"] for p in r["postings"]}
        for r in out
    }
    assert got == expect
    for r in out:
        assert r["df_shard"] == len(r["postings"])
        assert r["cf_shard"] == sum(p["tf"] for p in r["postings"])
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)  # postings doc_id-ordered


def test_min_df_prunes_global_tail(spark):
    idx = build_inverted_index(_df(spark), n_shards=N_SHARDS, min_df=2)
    terms = {r["term"] for r in idx.select("term").distinct().collect()}
    # global df: 'cat' appears in docs 1,3,6 (df=3) -> kept even though
    # each shard alone may hold fewer; 'lone' df=1 -> pruned.
    assert "cat" in terms and "sat" in terms
    assert "lone" not in terms and "unrelated" not in terms


def test_and_vs_or_semantics(spark):
    docs = _df(spark)
    idx = build_inverted_index(docs, n_shards=N_SHARDS)
    norms = doc_norms(docs)
    q = ["cat", "sat"]
    a = {r["doc_id"] for r in search_index(idx, norms, q, mode="and").collect()}
    o = {r["doc_id"] for r in search_index(idx, norms, q, mode="or").collect()}
    assert a == {"1", "6"}  # both terms required
    assert o == {"1", "2", "3", "6"}  # any term
    assert a <= o


def test_single_term_matches_corpus_side_bm25(spark):
    """Index-backed scoring must equal the corpus-side scorer exactly
    (same Lucene-idf arithmetic, 4dp) — the index adds no drift."""
    docs = _df(spark)
    got = {
        r["doc_id"]: r["bm25"]
        for r in search_index(
            build_inverted_index(docs, n_shards=N_SHARDS),
            doc_norms(docs),
            ["cat"],
            mode="or",
            k=100,
        ).collect()
    }
    ref = {
        str(r["doc_id"]): r["bm25"]
        for r in bm25_scores(docs, ["cat"]).collect()
    }
    assert got == ref
    assert len(got) == 3 and all(math.isfinite(v) for v in got.values())


def test_rank_deterministic_and_capped(spark):
    docs = _df(spark)
    idx = build_inverted_index(docs, n_shards=N_SHARDS)
    norms = doc_norms(docs)
    out = search_index(idx, norms, ["cat", "dog", "sat"], mode="or", k=2).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
    # doc 3 has the highest tf concentration of cat/dog -> rank 1
    assert sorted(out, key=lambda r: r["rank"])[0]["doc_id"] == "3"


def test_partition_invariance(spark):
    docs = _df(spark)
    a = sorted(
        search_index(
            build_inverted_index(docs, n_shards=N_SHARDS),
            doc_norms(docs),
            ["cat", "sat"],
            mode="or",
        ).collect()
    )
    rep = docs.repartition(5)
    b = sorted(
        search_index(
            build_inverted_index(rep, n_shards=N_SHARDS),
            doc_norms(rep),
            ["cat", "sat"],
            mode="or",
        ).collect()
    )
    assert a == b


def test_shards_bound_posting_rows(spark):
    """No (term, shard) row may hold more postings than its shard has
    documents — the boundedness invariant that replaces one unbounded
    per-term array at scale."""
    idx = build_inverted_index(_df(spark), n_shards=N_SHARDS)
    shard_docs: dict[int, int] = {}
    for i, t in DOCS:
        if [w for w in t.lower().strip().split() if w]:
            s = _shard(i)
            shard_docs[s] = shard_docs.get(s, 0) + 1
    for r in idx.collect():
        assert len(r["postings"]) <= shard_docs[r["shard"]]
