"""Structured-Streaming ingest wrapper.

The reference has no stream engine — "streaming" is REST event-at-a-time
with idempotent MERGE (``/root/reference/src/app/backend/v1/api.py:149-163``;
SURVEY.md §2-J). Our batch pipeline is the source of truth; this wrapper
runs the SAME stage functions over a stream in ``foreachBatch`` so the
merge semantics (and tests) are shared, not re-implemented:

* watermark on ``warc_ts`` bounds state only — there are no windowed aggs
  in the reference to reproduce;
* each micro-batch runs extract -> triples -> an idempotent upsert into
  the edge table keyed (subj, predicate, obj): re-delivered pages are
  harmless because the triple key dedups and props are last-writer-wins
  by (warc_ts, url) — same tie-break as the batch path;
* exactly-once = checkpointLocation (offset tracking) + idempotent sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _merge_edges(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Idempotent edge upsert (batch-side MERGE INTO equivalent): union the
    delta, re-dedup on the triple key keeping max (start_time, url)."""
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
    """
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    edges_dir = os.path.join(workdir, "edges")
    ckpt_dir = os.path.join(workdir, "_checkpoint")

    static_schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(static_schema)
        .parquet(source_dir)
        .withWatermark("warc_ts", watermark)
    )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
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
        merged.write.mode("overwrite").parquet(edges_dir + ".tmp")
        import shutil
        shutil.rmtree(edges_dir, ignore_errors=True)
        os.replace(edges_dir + ".tmp", edges_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", ckpt_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
