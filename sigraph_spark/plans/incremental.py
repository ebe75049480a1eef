"""Continuous-crawl incremental pipeline: fold page DELTAS into persistent
graph state without recomputing the corpus.

``run_pipeline`` (plans/pipeline.py) is the full-recompute path with
per-stage resume; this module is the APPEND path a 10^12-document crawl
actually runs between full rebuilds: each delta is extracted and
triple-parsed in isolation, linked INCREMENTALLY against the stored
entity state (operators/linking.incremental_link_entities — only unseen
entities are signed/scored, history frozen), and merged into the
cumulative canonical edge table with the same last-writer-wins + weight-sum
combiners as the streaming sink.

Durability contract (same device as streaming/ingest.py): every state
table writes as a new VERSIONED directory, then ONE atomic rename of
``_state.json`` — which carries the applied-delta ledger — makes
everything live together. A crash before the swap leaves the old state
fully intact (orphan version dirs are garbage-collected on the next
apply); a redelivered delta no-ops on the ledger, so weights can never
double-count. In production each table is an Iceberg MERGE INTO
(plans/iceberg_sql.py: edges, entity_mapping, entity_band_index,
entity_shingle_df) with the delta fingerprint as a snapshot property.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATE = "_state.json"


def _read_state(workdir: str) -> dict:
    p = os.path.join(workdir, _STATE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"applied": [], "version": 0, "n_entities": 0, "tables": {}}


def _load(spark: SparkSession, workdir: str, st: dict, name: str) -> DataFrame | None:
    rel = st["tables"].get(name)
    return spark.read.parquet(os.path.join(workdir, rel)) if rel else None


def crawl_state_tables(spark: SparkSession, workdir: str) -> dict[str, DataFrame | None]:
    """Current committed state: {edges, mapping, band_index, shingle_df}."""
    st = _read_state(workdir)
    return {
        name: _load(spark, workdir, st, name)
        for name in ("edges", "mapping", "band_index", "shingle_df")
    }


def _merge_edges(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Same semilattice combiner as streaming/ingest.py: last-writer props
    by (start_time, url), weight sums across distinct deltas (the ledger
    guarantees at-most-once per delta)."""
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


def apply_crawl_delta(
    spark: SparkSession,
    delta_pages: DataFrame,
    workdir: str,
    delta_id: str,
) -> dict | None:
    """Fold one crawl delta (pages table) into the persistent state at
    ``workdir``. ``delta_id`` is the caller's idempotency key (crawl
    segment id / snapshot fingerprint). Returns the apply report, or None
    when the delta was already applied (replay no-op)."""
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.linking import (
        LinkState, canonicalize_triples, empty_link_state,
        incremental_link_entities,
    )
    from sigraph_spark.operators.triples import triples_from_docs

    st = _read_state(workdir)
    if delta_id in st["applied"]:
        return None

    docs = extract_pages(delta_pages).select("url", "warc_ts", "text")
    triples = triples_from_docs(docs).localCheckpoint(eager=True)

    prev = LinkState(
        mapping=_load(spark, workdir, st, "mapping")
        or empty_link_state(spark).mapping,
        band_index=_load(spark, workdir, st, "band_index")
        or empty_link_state(spark).band_index,
        shingle_df=_load(spark, workdir, st, "shingle_df")
        or empty_link_state(spark).shingle_df,
        n_entities=st["n_entities"],
    )
    mapping_total, new_state = incremental_link_entities(triples, prev)

    canon = canonicalize_triples(triples, mapping_total).join(
        docs.select("url", "warc_ts"), "url"
    )
    edge_delta = (
        canon.groupBy(F.col("subj"), F.col("verb").alias("predicate"), F.col("obj"))
        .agg(
            F.max(F.struct("warc_ts", "url")).alias("_lw"),
            F.count(F.lit(1)).alias("weight"),
        )
        .select(
            "subj", "predicate", "obj",
            F.col("_lw.warc_ts").alias("start_time"),
            F.col("_lw.url").alias("provenance_url"),
            "weight",
        )
    )
    edges_total = _merge_edges(_load(spark, workdir, st, "edges"), edge_delta)

    # versioned write + single atomic _state.json swap
    ver = st["version"] + 1
    new_tables = {}
    for name, df in (
        ("edges", edges_total),
        ("mapping", new_state.mapping),
        ("band_index", new_state.band_index),
        ("shingle_df", new_state.shingle_df),
    ):
        rel = os.path.join(f"v{ver}", name)
        df.write.mode("overwrite").parquet(os.path.join(workdir, rel))
        new_tables[name] = rel
    new_st = {
        "applied": sorted({*st["applied"], delta_id}),
        "version": ver,
        "n_entities": new_state.n_entities,
        "tables": new_tables,
    }
    tmp = os.path.join(workdir, _STATE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(new_st, f, indent=1)
    os.replace(tmp, os.path.join(workdir, _STATE))
    # GC superseded / orphaned version dirs (single-writer discipline)
    for vname in os.listdir(workdir):
        if (
            vname.startswith("v")
            and vname != f"v{ver}"
            and os.path.isdir(os.path.join(workdir, vname))
        ):
            shutil.rmtree(os.path.join(workdir, vname), ignore_errors=True)

    # report counts come from the freshly COMMITTED parquet — re-evaluating
    # the lazy edges_total plan here would re-read the GC'd old version
    return {
        "delta_id": delta_id,
        "version": ver,
        "pages": delta_pages.count(),
        "triples": triples.count(),
        "entities_total": new_state.n_entities,
        "edges_total": spark.read.parquet(
            os.path.join(workdir, new_tables["edges"])
        ).count(),
    }
