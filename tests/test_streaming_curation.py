"""Streaming curation intake: stream == batch for the stateless stages,
cross-batch dedup via the stored index, replay idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sigraph_spark.streaming.curation import (
    curate_batch, curated_corpus, stream_curation,
)

GOOD = "the cat sat on the mat and the dog sat on the rug for a while it was calm"
GOOD2 = "the quick brown fox jumps over the lazy dog and naps in the warm sun all day"
BAD_LANG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_batches_dedup_across_batches(spark, tmp_path):
    wd = str(tmp_path / "cur")
    b0 = _docs(spark, [(1, GOOD, "en"), (2, BAD_LANG, "en"), (3, "tiny", "en")])
    r0 = curate_batch(b0, 0, wd)
    assert r0 == {"input": 3, "passed": 1, "admitted": 1}

    # batch 1: exact dup of an ADMITTED doc + one genuinely new doc
    b1 = _docs(spark, [(10, GOOD, "en"), (11, GOOD2, "en")])
    r1 = curate_batch(b1, 1, wd)
    assert r1 == {"input": 2, "passed": 2, "admitted": 1}

    corpus = curated_corpus(spark, wd)
    assert sorted(r["doc_id"] for r in corpus.collect()) == [1, 11]


def test_curate_batch_replay_is_noop(spark, tmp_path):
    wd = str(tmp_path / "cur")
    b0 = _docs(spark, [(1, GOOD, "en")])
    assert curate_batch(b0, 0, wd) is not None
    before = sorted(map(tuple, curated_corpus(spark, wd).collect()))
    # redelivery of the same batch id (crash between swap and checkpoint)
    assert curate_batch(b0, 0, wd) is None
    after = sorted(map(tuple, curated_corpus(spark, wd).collect()))
    assert before == after
    # and a REJECTED duplicate cannot sneak in via a replayed later batch
    b1 = _docs(spark, [(5, GOOD, "en")])
    curate_batch(b1, 1, wd)
    curate_batch(b1, 1, wd)
    assert sorted(r["doc_id"] for r in curated_corpus(spark, wd).collect()) == [1]


def test_stream_equals_batch_admissions(spark, tmp_path):
    src = str(tmp_path / "drop")
    wd = str(tmp_path / "swd")
    os.makedirs(src, exist_ok=True)
    docs = _docs(
        spark,
        [(1, GOOD, "en"), (2, GOOD, "en"), (3, GOOD2, "en"), (4, BAD_LANG, "en")],
    )
    docs.write.mode("overwrite").parquet(src)
    q = stream_curation(spark, src, wd)
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in curated_corpus(spark, wd).collect())
    # funnel drops 4, exact dedup keeps min-id of {1,2}
    assert got == [1, 3]
