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
  (warc_ts, url), weight sums per-batch counts. Entity canonicalization
  here is BATCH-LOCAL (each micro-batch links its own vocabulary) — the
  latency-first choice; for globally consistent canonicals across deltas
  use the batch append path ``plans/incremental.apply_crawl_delta``,
  which carries persistent frozen-history linking state;
* exactly-once = checkpointLocation (offset tracking) + an IDEMPOTENT
  sink with an applied-batch ledger, so a crash between table commit and
  the streaming checkpoint re-delivers the same batch_id and the sink
  no-ops — weight can never double-count (ADVICE r1).

BUCKETED LOCAL BINDING (O(delta), not O(table), per batch): the edge
table is stored as N_BUCKETS hash buckets of the triple key, each bucket
a versioned parquet directory, with a single ``_manifest.json`` mapping
bucket -> current version path (the ledger rides inside the manifest).
A micro-batch merges ONLY the buckets its delta touches, writes them as
new versions under ``v{batch_id}/``, then commits everything with ONE
atomic manifest rename — untouched bucket files are never rewritten
(byte-identical across the batch, pinned by test). A crash before the
manifest swap leaves the old manifest live and only orphan version dirs,
garbage-collected on the next batch. This is the parquet-local analog of
the production Iceberg MERGE INTO against a bucket(subj)-partitioned
table with a batch-id snapshot property.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_MANIFEST = "_manifest.json"
N_BUCKETS = 16


def _bucket_col() -> Column:
    return F.pmod(F.xxhash64("subj", "predicate", "obj"), F.lit(N_BUCKETS))


def _read_manifest(edges_dir: str) -> dict:
    p = os.path.join(edges_dir, _MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"applied": [], "buckets": {}}


def applied_batch_ids(edges_dir: str) -> set[int]:
    return set(_read_manifest(edges_dir)["applied"])


def read_edges(spark: SparkSession, edges_dir: str) -> DataFrame | None:
    """The current edge table: the union of every bucket's manifest-
    referenced version directory. Returns None when nothing is committed."""
    man = _read_manifest(edges_dir)
    paths = sorted(
        os.path.join(edges_dir, rel) for rel in man["buckets"].values()
    )
    if not paths:
        return None
    return spark.read.parquet(*paths)


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


def _gc_unreferenced(edges_dir: str, man: dict) -> None:
    """Remove bucket version subdirectories no longer referenced by the
    manifest (superseded versions + orphans from crashes before a manifest
    swap), then drop emptied version dirs. Single-writer discipline: the
    streaming query is the only writer, so anything unreferenced is dead."""
    live = {os.path.normpath(rel) for rel in man["buckets"].values()}
    for vname in list(os.listdir(edges_dir)) if os.path.isdir(edges_dir) else []:
        vdir = os.path.join(edges_dir, vname)
        if not os.path.isdir(vdir) or not vname.startswith("v"):
            continue
        for bname in os.listdir(vdir):
            rel = os.path.normpath(os.path.join(vname, bname))
            sub = os.path.join(vdir, bname)
            if os.path.isdir(sub) and rel not in live:
                shutil.rmtree(sub, ignore_errors=True)
        if not any(n.startswith("_bucket=") for n in os.listdir(vdir)):
            shutil.rmtree(vdir, ignore_errors=True)


def apply_pages_batch(batch: DataFrame, batch_id: int, edges_dir: str) -> bool:
    """Fold one micro-batch of pages into the bucketed edge table at
    ``edges_dir``.

    Returns False (no-op) when ``batch_id`` is already in the ledger —
    the redelivery path after a crash between manifest swap and checkpoint
    commit. Otherwise: extract -> triples -> link -> per-batch delta ->
    merge ONLY the touched buckets -> one atomic manifest rename.
    """
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        canonicalize_triples, link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    spark = batch.sparkSession
    man = _read_manifest(edges_dir)
    # GC BEFORE the ledger check so crash orphans are collected even when
    # the stream is only re-delivering already-applied batches
    if os.path.isdir(edges_dir):
        _gc_unreferenced(edges_dir, man)
    if int(batch_id) in set(man["applied"]):
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
        .withColumn("_bucket", _bucket_col())
        .localCheckpoint(eager=True)
    )
    touched = sorted(r["_bucket"] for r in delta.select("_bucket").distinct().collect())
    if not touched:
        # empty micro-batch still commits its ledger entry (one manifest swap)
        new_man = {"applied": sorted({*man["applied"], int(batch_id)}),
                   "buckets": man["buckets"]}
        _commit_manifest(edges_dir, new_man)
        return True

    existing_paths = [
        os.path.join(edges_dir, man["buckets"][str(b)])
        for b in touched
        if str(b) in man["buckets"]
    ]
    existing = spark.read.parquet(*existing_paths) if existing_paths else None
    merged = _merge_edges(existing, delta.drop("_bucket"))

    vname = f"v{int(batch_id)}"
    vdir = os.path.join(edges_dir, vname)
    shutil.rmtree(vdir, ignore_errors=True)  # crashed prior attempt
    merged.withColumn("_bucket", _bucket_col()).write.partitionBy(
        "_bucket"
    ).mode("overwrite").parquet(vdir)

    new_buckets = dict(man["buckets"])
    for b in touched:
        new_buckets[str(b)] = os.path.join(vname, f"_bucket={b}")
    new_man = {
        "applied": sorted({*man["applied"], int(batch_id)}),
        "buckets": new_buckets,
    }
    # THE commit: one atomic rename makes (data versions + ledger) live
    _commit_manifest(edges_dir, new_man)
    _gc_unreferenced(edges_dir, new_man)
    return True


def _commit_manifest(edges_dir: str, man: dict) -> None:
    os.makedirs(edges_dir, exist_ok=True)
    tmp = os.path.join(edges_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(edges_dir, _MANIFEST))


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
    micro-batches. Read the result with :func:`read_edges`.
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
