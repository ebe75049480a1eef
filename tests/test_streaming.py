"""Structured-Streaming ingest: foreachBatch shares the batch stage fns;
re-delivery is idempotent on the (subj, predicate, obj) key."""

from __future__ import annotations

import os

from sigraph_spark.corpus import gen_pages
from sigraph_spark.streaming.ingest import stream_pages_to_edges


def test_stream_matches_batch(spark, tmp_path):
    pages = gen_pages(spark, sf=0.001)
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    wd = str(tmp_path / "wd")

    q = stream_pages_to_edges(spark, src, wd, trigger_once=True)
    q.awaitTermination(600)

    edges = spark.read.parquet(os.path.join(wd, "edges"))
    n1 = edges.count()
    assert n1 > 0
    keys1 = {
        (r["subj"], r["predicate"], r["obj"]) for r in edges.collect()
    }
    assert len(keys1) == n1  # triple key unique

    # batch pipeline over the same pages yields the same canonical triples
    from pyspark.sql import functions as F

    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    docs = extract_pages(pages).select("url", "warc_ts", "text")
    triples = triples_from_docs(docs)
    mapping = link_entities(triples)
    canon = canonicalize_triples(triples, mapping)
    keys2 = {
        (r["subj"], r["verb"], r["obj"])
        for r in canon.select("subj", "verb", "obj").distinct().collect()
    }
    assert keys1 == keys2


def test_redelivered_batch_is_noop(spark, tmp_path):
    """Crash between table swap and checkpoint commit re-delivers the same
    batch_id: the applied-batch ledger must skip it so weight never
    double-counts (ADVICE r1)."""
    from sigraph_spark.streaming.ingest import apply_pages_batch, applied_batch_ids

    pages = gen_pages(spark, sf=0.001).limit(200).localCheckpoint()
    edges_dir = str(tmp_path / "edges")

    assert apply_pages_batch(pages, 0, edges_dir) is True
    t1 = sorted(
        map(tuple, spark.read.parquet(edges_dir).collect())
    )
    # redelivery of the SAME batch id -> no-op, identical table
    assert apply_pages_batch(pages, 0, edges_dir) is False
    t2 = sorted(map(tuple, spark.read.parquet(edges_dir).collect()))
    assert t1 == t2
    assert applied_batch_ids(edges_dir) == {0}
    # a genuinely NEW batch still folds in (weights sum across batches)
    assert apply_pages_batch(pages, 1, edges_dir) is True
    w1 = {(r["subj"], r["predicate"], r["obj"]): r["weight"]
          for r in spark.read.parquet(edges_dir).collect()}
    old = {(r[0], r[1], r[2]): r[5] for r in t1}
    assert all(w1[k] == 2 * old[k] for k in old)
    assert applied_batch_ids(edges_dir) == {0, 1}
