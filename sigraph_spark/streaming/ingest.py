"""Structured-Streaming ingest wrapper.

The reference has no stream engine — "streaming" is REST event-at-a-time
with idempotent MERGE (``/root/reference/src/app/backend/v1/api.py:149-163``;
SURVEY.md §2-J). Our batch pipeline is the source of truth; this wrapper
runs the SAME stage functions over a stream in ``foreachBatch`` so the
merge semantics (and tests) are shared, not re-implemented:

* watermark on ``warc_ts`` bounds state only — there are no windowed aggs
  in the reference to reproduce;
* each micro-batch runs extract -> triples -> an upsert into the edge
  table keyed (subj, predicate, obj): props are last-writer-wins by
  (warc_ts, url), weight sums per-batch counts;
* exactly-once = checkpointLocation (offset tracking) + an IDEMPOTENT
  sink: the sink records every applied ``batch_id`` in an ``_applied.json``
  ledger that rides INSIDE the edge table directory (so the atomic
  ``os.replace`` commits data + ledger together). A crash after the table
  swap but before the streaming checkpoint commits re-delivers the same
  batch_id — the ledger skips it, so weight can never double-count
  (ADVICE r1). Hidden ``_``-prefixed files are invisible to Spark's
  parquet reader, like ``_SUCCESS``.

On a production cluster the ledger seam is the Iceberg MERGE INTO with a
``batch_id`` snapshot property check (write.audit of applied batches);
the parquet-local binding keeps the same contract testable here.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_LEDGER = "_applied.json"


def _merge_edges(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Edge upsert (batch-side MERGE INTO equivalent): union the delta,
    re-dedup on the triple key keeping max (start_time, url) props; weight
    sums the per-batch counts (distinct batches only — the applied-batch
    ledger guarantees each batch folds in at most once)."""
    all_rows = delta if existing is None else existing.unionByName(delta)
    return (
        all_rows.groupBy("subj", "predicate", "obj")
        .agg(
            F.max(F.struct("start_time", "provenance_url", "weight")).alias("_m"),
            F.sum("weight").alias("_wsum"),
        )
        .select(
            "subj", "predicate", "obj",
            F.col("_m.start_time").alias("start_time"),
            F.col("_m.provenance_url").alias("provenance_url"),
            F.col("_wsum").alias("weight"),
        )
    )


def applied_batch_ids(edges_dir: str) -> set[int]:
    p = os.path.join(edges_dir, _LEDGER)
    if os.path.exists(p):
        with open(p) as f:
            return set(json.load(f))
    return set()


def apply_pages_batch(batch: DataFrame, batch_id: int, edges_dir: str) -> bool:
    """Fold one micro-batch of pages into the edge table at ``edges_dir``.

    Returns False (no-op) when ``batch_id`` is already in the ledger —
    the redelivery path after a crash between table swap and checkpoint
    commit. Otherwise: extract -> triples -> link -> per-batch delta ->
    merge -> atomic swap of (data + ledger).
    """
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    applied = applied_batch_ids(edges_dir)
    if batch_id in applied:
        return False

    docs = extract_pages(batch).select("url", "warc_ts", "text")
    triples = triples_from_docs(docs)
    mapping = link_entities(triples)
    canon = canonicalize_triples(triples, mapping).join(
        docs.select("url", "warc_ts"), "url"
    )
    delta = (
        canon.groupBy(F.col("subj"), F.col("verb").alias("predicate"), F.col("obj"))
        .agg(F.max(F.struct("warc_ts", "url")).alias("_lw"), F.count(F.lit(1)).alias("weight"))
        .select(
            "subj", "predicate", "obj",
            F.col("_lw.warc_ts").alias("start_time"),
            F.col("_lw.url").alias("provenance_url"),
            "weight",
        )
    )
    existing = None
    if os.path.exists(edges_dir):
        existing = batch.sparkSession.read.parquet(edges_dir)
    merged = _merge_edges(existing, delta).localCheckpoint(eager=True)
    tmp = edges_dir + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _LEDGER), "w") as f:
        json.dump(sorted(applied | {int(batch_id)}), f)
    shutil.rmtree(edges_dir, ignore_errors=True)
    os.replace(tmp, edges_dir)
    return True


def stream_pages_to_edges(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    trigger_once: bool = True,
    watermark: str = "1 hour",
) -> StreamingQuery:
    """pages parquet dir (streamed) -> canonical edge table at
    ``{workdir}/edges`` via foreachBatch running the batch stage functions.

    ``trigger_once`` processes all available input then stops — the
    batch-equivalent mode used in tests; leave False for continuous
    micro-batches.

    The per-micro-batch full-table rewrite is the parquet-local binding
    only; in production the same ``apply_pages_batch`` contract binds to an
    Iceberg MERGE INTO (O(delta), not O(table), per batch).
    """
    edges_dir = os.path.join(workdir, "edges")
    ckpt_dir = os.path.join(workdir, "_checkpoint")

    static_schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(static_schema)
        .parquet(source_dir)
        .withWatermark("warc_ts", watermark)
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_pages_batch(batch, batch_id, edges_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
