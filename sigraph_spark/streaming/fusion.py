"""Streaming claims intake: fold micro-batches of claims into the
persistent claim state and keep the fused KG current.

The streaming form of ``plans.postprocess``'s k1/k2: each micro-batch of
(subject, predicate, object, source) claims merges into the stored claim
set through the ``fusion.merge_claims`` set-union semilattice — so batch
order, duplication inside a batch, and replay of a whole batch are ALL
no-ops by construction, and the fused table recomputed from the state is
bit-identical to a from-scratch fuse over every claim ever seen
(pinned by the ``triple_fusion_merge`` gate).

Exactly-once = the same applied-batch-id ledger + two-rename atomic swap
device as ``streaming/curation.py`` (the ledger rides inside the state
directory and commits with it). At 100 TB the swap seam is an Iceberg
MERGE INTO keyed on the full claim tuple; the parquet-local binding
keeps the identical contract testable here. The fused table is a DERIVED
artifact — rebuilt per batch from the state, never merged incrementally,
so a crash mid-rebuild costs recomputation, never correctness.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sigraph_spark.streaming.curation import _applied

_CLAIM_COLS = ["subject", "predicate", "object", "source"]


def fold_claims_batch(
    batch: DataFrame, batch_id: int, workdir: str
) -> dict[str, int] | None:
    """Fold one micro-batch of claims into the state at ``workdir``.
    Returns {claims_state, fused} counts, or None on a replayed
    batch_id."""
    from sigraph_spark.operators.fusion import fuse_triples, merge_claims

    state_dir = os.path.join(workdir, "claims_state")
    applied = _applied(state_dir)
    if batch_id in applied:
        return None

    spark = batch.sparkSession
    if os.path.exists(os.path.join(state_dir, "data")):
        state = spark.read.parquet(os.path.join(state_dir, "data"))
    else:
        state = None
    merged = merge_claims(state, batch.select(*_CLAIM_COLS)).localCheckpoint(
        eager=True
    )

    tmp = state_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, "_applied.json"), "w") as f:
        json.dump(sorted(applied | {int(batch_id)}), f)
    old = state_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(state_dir):
        os.replace(state_dir, old)
    os.replace(tmp, state_dir)
    shutil.rmtree(old, ignore_errors=True)

    fused = fuse_triples(merged, *_CLAIM_COLS)
    fused.write.mode("overwrite").parquet(os.path.join(workdir, "fused"))
    return {"claims_state": merged.count(), "fused": fused.count()}


def stream_claims(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    schema: str = (
        "subject string, predicate string, object string, source string"
    ),
) -> StreamingQuery:
    """readStream over a claims drop directory -> foreachBatch fold."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: fold_claims_batch(b, bid, workdir)
        )
        .option("checkpointLocation", os.path.join(workdir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
