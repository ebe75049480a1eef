"""applyInPandasWithState: per-entity running stats over a rate-limited
edge stream; state accumulates across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sigraph_spark.streaming.stateful import running_entity_stats


def test_running_entity_stats_accumulates(spark, tmp_path):
    src_dir = str(tmp_path / "edges")
    # two files -> availableNow processes them (possibly one batch; state
    # must still fold every row exactly once)
    rows1 = [("a", "CONNECT", "x", "2024-01-01 00:00:00", 2),
             ("a", "CONNECT", "y", "2024-01-01 01:00:00", 3),
             ("b", "CREATE", "z", "2024-01-01 02:00:00", 5)]
    rows2 = [("a", "CONNECT", "z", "2024-01-02 00:00:00", 7),
             ("b", "CREATE", "w", "2024-01-02 01:00:00", 1)]
    schema = "src string, predicate string, dst string, start_time string, weight long"
    df1 = spark.createDataFrame(rows1, schema).withColumn(
        "start_time", F.col("start_time").cast("timestamp"))
    df2 = spark.createDataFrame(rows2, schema).withColumn(
        "start_time", F.col("start_time").cast("timestamp"))
    df1.coalesce(1).write.parquet(src_dir)
    df2.coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        running_entity_stats(stream)
        .writeStream.format("memory")
        .queryName("entity_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    out = spark.table("entity_stats")
    # take the final (max-degree) row per entity — update mode emits one
    # row per entity per micro-batch it appeared in
    final = {
        r["src"]: (r["degree"], r["weight_sum"])
        for r in out.groupBy(F.col("entity").alias("src"))
        .agg(F.max("degree").alias("degree"), F.max("weight_sum").alias("weight_sum"))
        .collect()
    }
    assert final["a"] == (3, 12)
    assert final["b"] == (2, 6)


class _FakeState:
    """Duck-typed GroupState for unit-testing the update closure (driving a
    real ProcessingTimeTimeout needs a continuous trigger that never
    terminates under availableNow)."""

    def __init__(self, value=None, has_timed_out=False):
        self._value = value
        self.hasTimedOut = has_timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timeout_evicts_state_and_emits_nothing():
    """When ProcessingTimeTimeout fires (empty invocation), the key's state
    must be REMOVED and no stale output row emitted — otherwise eviction
    never happens and state grows unboundedly (ADVICE r1)."""
    from sigraph_spark.streaming.stateful import _make_update_fn

    update = _make_update_fn(evict_ms=1000)
    state = _FakeState(value=(3, 7, None, None), has_timed_out=True)
    out = list(update(("a",), iter([]), state))
    assert out == []
    assert state.removed
    assert state.timeout_set is None  # must not re-arm the timeout


def test_data_invocation_updates_and_arms_timeout():
    import pandas as pd

    from sigraph_spark.streaming.stateful import _make_update_fn

    update = _make_update_fn(evict_ms=1000)
    state = _FakeState()
    pdf = pd.DataFrame({
        "src": ["a", "a"],
        "start_time": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        "weight": [2, 3],
    })
    out = list(update(("a",), iter([pdf]), state))
    assert len(out) == 1 and int(out[0]["degree"].iloc[0]) == 2
    assert state.get[1] == 5
    assert state.timeout_set == 1000
