"""Streaming training-data ingestion: normalize -> funnel -> incremental
exact dedup against a persistent content-hash index, in foreachBatch.

The streaming form of ``plans.pipeline.run_curation``'s front half, built
for continuous crawl intake: each micro-batch of documents is

  1. normalized and pushed through the curation rule funnel (stateless
     narrow maps — identical Column expressions as batch, so
     stream == batch exactly);
  2. classified against the STORED content-hash index with
     ``dedup.incremental_exact_dedup`` — the corpus is never re-hashed,
     each batch costs O(|batch|) plus one join against the bucketed
     index;
  3. only ``new``-status survivors are appended to the corpus directory,
     and their (content_hash, id) rows are appended to the index.

Exactly-once = streaming checkpoint (offset tracking) + the same
applied-batch-id ledger device as ``streaming/ingest.py``: the ledger
rides inside the index directory and commits atomically with it, so a
redelivered micro-batch (crash between table swap and checkpoint commit)
is a no-op — a doc can never be admitted twice, and a doc REJECTED as a
duplicate can never sneak in on replay.

At 100 TB the index/corpus swap seam is an Iceberg MERGE INTO / append
with a batch-id snapshot property; the parquet-local binding keeps the
identical contract testable here.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_LEDGER = "_applied.json"


def _applied(index_dir: str) -> set[int]:
    # crash recovery for the two-rename swap in curate_batch: if we died
    # between demoting the old index and promoting the new one, the '.old'
    # copy is the only complete index — restore it before reading.
    old = index_dir + ".old"
    if not os.path.exists(index_dir) and os.path.exists(old):
        os.replace(old, index_dir)
    p = os.path.join(index_dir, _LEDGER)
    if os.path.exists(p):
        with open(p) as f:
            return set(json.load(f))
    return set()


def curate_batch(
    batch: DataFrame, batch_id: int, workdir: str
) -> dict[str, int] | None:
    """Fold one micro-batch of documents (doc_id, text, lang) into the
    curated corpus at ``workdir``. Returns the admission report, or None
    when the batch_id was already applied (replay no-op)."""
    from sigraph_spark.operators.corpus import curation_funnel, normalize_text
    from sigraph_spark.operators.dedup import incremental_exact_dedup

    index_dir = os.path.join(workdir, "hash_index")
    corpus_dir = os.path.join(workdir, "corpus")
    applied = _applied(index_dir)
    if batch_id in applied:
        return None

    spark = batch.sparkSession
    normed = (
        batch.select("doc_id", "lang")
        .join(normalize_text(batch), "doc_id")
        .select("doc_id", F.col("norm_text").alias("text"), "lang")
    )
    verdicts = curation_funnel(normed)
    passed = normed.join(
        verdicts.filter(F.col("verdict") == "pass").select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)

    if os.path.exists(os.path.join(index_dir, "data")):
        index = spark.read.parquet(os.path.join(index_dir, "data"))
    else:
        index = spark.createDataFrame([], "id long, content_hash string")
    statuses = incremental_exact_dedup(passed, index).localCheckpoint(eager=True)
    new_rows = statuses.filter(F.col("status") == "new")
    admitted = passed.join(new_rows.select("doc_id"), "doc_id")

    # atomic commit: new index (old ∪ new hashes) + ledger swap together;
    # the corpus append lands BEFORE the index swap, so a crash in between
    # re-delivers the batch, the ledger check no-ops, and the only residue
    # is an orphaned corpus part-file for a batch that IS in the corpus —
    # guarded by writing the corpus per-batch into its own subdirectory
    # keyed by batch_id (replays overwrite the same path idempotently).
    admitted.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch_id={int(batch_id)}")
    )
    new_index = index.unionByName(
        new_rows.select(F.col("doc_id").alias("id"), "content_hash")
    ).localCheckpoint(eager=True)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    new_index.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, _LEDGER), "w") as f:
        json.dump(sorted(applied | {int(batch_id)}), f)
    # swap via two renames so there is NO window where the index (and its
    # ledger of every previously applied batch) is absent from disk: a
    # crash between the renames leaves either the old or the new index
    # directory live, never neither — delete-then-rename would let a crash
    # drop the whole ledger and re-admit every prior doc on restart.
    old = index_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(index_dir):
        os.replace(index_dir, old)
    os.replace(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)

    return {
        "input": batch.count(),
        "passed": passed.count(),
        "admitted": admitted.count(),
    }


def stream_curation(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    schema: str = "doc_id long, text string, lang string",
    trigger_once: bool = True,
) -> StreamingQuery:
    """readStream over a document drop-directory -> curate_batch sink."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: curate_batch(b, i, workdir) and None
        )
        .option("checkpointLocation", os.path.join(workdir, "_checkpoint"))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curated_corpus(spark: SparkSession, workdir: str) -> DataFrame:
    """The admitted corpus across all applied batches."""
    return spark.read.parquet(os.path.join(workdir, "corpus"))
