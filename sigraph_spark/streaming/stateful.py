"""Custom stateful streaming operator: per-entity running graph stats.

The reference's ingest keeps per-node accumulating state (span/trace id
lists, trace span counts — ``/root/reference/src/graph/graph_element/
element_behavior.py:316-375``) by re-reading Neo4j per event. In
Structured Streaming the same semantics are a keyed state machine:
``applyInPandasWithState`` keyed by entity, state = (degree, weight sum,
first/last seen), emitting one updated row per entity per micro-batch.

This complements streaming/ingest.py (which re-runs the batch MERGE in
``foreachBatch``): use the stateful form when downstream consumers need
low-latency per-entity aggregates rather than a full table rewrite.

State is bounded: one fixed-width row per entity; eviction via
GroupStateTimeout (processing-time) keeps the working set to recently
active entities (inactive ones age out and re-hydrate from the batch
tables on next touch — the lambda-architecture handoff).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("degree", T.LongType()),
        T.StructField("weight_sum", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("degree", T.LongType()),
        T.StructField("weight_sum", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)


def _make_update_fn(evict_ms: int):
    """Build the state-update closure; fold this micro-batch's edges into
    the entity's running aggregates. Pure function of (state, batch) —
    replay-safe."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # ProcessingTimeTimeout fired: the key is invoked with no data.
            # Evict for real — drop the state and emit nothing. Re-arming the
            # timeout or emitting here would keep the key alive forever and
            # grow state unboundedly in continuous deployments; an aged-out
            # entity re-hydrates from the batch tables on its next touch.
            state.remove()
            return
        degree, weight_sum, first_seen, last_seen = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            degree += len(pdf)
            weight_sum += int(pdf["weight"].sum())
            lo = pdf["start_time"].min()
            hi = pdf["start_time"].max()
            first_seen = lo if first_seen is None else min(first_seen, lo)
            last_seen = hi if last_seen is None else max(last_seen, hi)
        state.update((degree, weight_sum, first_seen, last_seen))
        if evict_ms > 0:
            state.setTimeoutDuration(evict_ms)
        yield pd.DataFrame(
            {
                "entity": [key[0]],
                "degree": [degree],
                "weight_sum": [weight_sum],
                "first_seen": [first_seen],
                "last_seen": [last_seen],
            }
        )

    return update


_EVICT_MS = 24 * 3600 * 1000


def running_entity_stats(edge_stream: DataFrame, evict: bool = False) -> DataFrame:
    """edges stream (src, predicate, dst, start_time, weight) -> updating
    per-src running stats via applyInPandasWithState.

    ``evict=True`` enables ProcessingTimeTimeout state eviction for
    continuous deployments. Leave False for bounded runs: with a timeout
    configured the engine keeps scheduling batches to honor pending state
    timeouts, so ``availableNow`` triggers never terminate.
    """
    return (
        edge_stream.select("src", "start_time", "weight")
        .groupBy("src")
        .applyInPandasWithState(
            _make_update_fn(_EVICT_MS if evict else 0),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if evict
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
