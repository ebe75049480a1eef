"""Gap-based sessionization: the streaming form (session_window +
watermark, append mode) must emit exactly the batch sessions once the
watermark closes them — including a session whose events arrive in
DIFFERENT micro-batches (stateful session merging, not per-batch
grouping). Oracle for the batch form is the DuckDB lag/cumsum gate
``sessionize``; this module pins stream==batch."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from sigraph_spark.streaming.windows import sessionize

SCHEMA = "event_id long, ts timestamp, user_id long, value double"
T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + datetime.timedelta(seconds=s), u, v)
         for i, (s, u, v) in enumerate(rows)],
        SCHEMA,
    )


def _key(r):
    return (r["user_id"], r["session_start"], r["session_end"])


def test_batch_session_semantics(spark):
    rows = [
        (0, 1, 1.0), (120, 1, 2.0), (240, 1, 4.0),   # one session, u1
        (240 + 300, 1, 8.0),   # exactly gap apart: adjacency DOES merge
        (240 + 301, 2, 8.0),   # > gap after u2's nothing: own session
        (240 + 300 + 301, 1, 16.0),  # 301s > gap after 540s: new session
        (3600, 2, 1.5),
    ]
    out = {_key(r): (r["n_events"], r["total_value"])
           for r in sessionize(_mk(spark, rows), gap="5 minutes").collect()}
    gap = datetime.timedelta(minutes=5)
    s1 = (1, T0, T0 + datetime.timedelta(seconds=540) + gap)
    s2 = (1, T0 + datetime.timedelta(seconds=841),
          T0 + datetime.timedelta(seconds=841) + gap)
    assert out[s1] == (4, Decimal("15.00"))  # adjacency merged
    assert out[s2] == (1, Decimal("16.00"))  # strict gap splits
    assert len(out) == 4


def test_stream_equals_batch_with_cross_batch_merge(spark, tmp_path):
    # session A (u1) split across two FILES -> two micro-batches with
    # maxFilesPerTrigger=1; a far-future flusher event advances the
    # watermark so every earlier session is finalized and emitted
    part1 = [(0, 1, 1.0), (120, 1, 2.0), (30, 2, 5.0)]
    part2 = [(240, 1, 4.0), (7200, 9, 0.5)]  # 7200 = flusher
    src = str(tmp_path / "events")
    _mk(spark, part1).coalesce(1).write.parquet(src)
    _mk(spark, part2).coalesce(1).write.mode("append").parquet(src)

    all_events = spark.read.parquet(src)
    batch = {_key(r): (r["n_events"], r["total_value"])
             for r in sessionize(all_events, gap="5 minutes").collect()}

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        sessionize(stream, gap="5 minutes", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    emitted = {_key(r): (r["n_events"], r["total_value"])
               for r in spark.read.parquet(out_dir).collect()}
    # every emitted session matches batch exactly
    for k, v in emitted.items():
        assert batch[k] == v
    # the cross-micro-batch session (u1: 0s,120s | 240s) merged into ONE
    gap = datetime.timedelta(minutes=5)
    spanning = (1, T0, T0 + datetime.timedelta(seconds=240) + gap)
    assert emitted[spanning] == (3, Decimal("7.00"))
    # only the still-open flusher session may be missing
    missing = set(batch) - set(emitted)
    assert all(u == 9 for (u, _s, _e) in missing)


def test_sessionize_matches_python_reference_fuzz(spark):
    """400 events with random gaps across 12 users, sessionized by
    Spark's session_window vs an independent Python sweep-line
    reference (sorted per user; split on gap > 300s; end = last+300)."""
    import random

    rnd = random.Random(99)
    rows = []
    t = {u: rnd.randrange(0, 500) for u in range(12)}
    for i in range(400):
        u = rnd.randrange(12)
        t[u] += rnd.choice([1, 30, 299, 300, 301, 600, 5000])
        rows.append((t[u], u, float(rnd.randrange(100)) / 4))
    df = _mk(spark, rows)

    got = {
        _key(r): (r["n_events"], r["total_value"])
        for r in sessionize(df, gap="5 minutes").collect()
    }

    # independent reference
    per_user = {}
    for s, u, v in rows:
        per_user.setdefault(u, []).append((s, v))
    exp = {}
    for u, evs in per_user.items():
        evs.sort()
        start, last, n, tot = None, None, 0, Decimal("0")
        for s, v in evs:
            if start is None or s - last > 300:
                if start is not None:
                    k = (u, T0 + datetime.timedelta(seconds=start),
                         T0 + datetime.timedelta(seconds=last + 300))
                    exp[k] = (n, tot)
                start, n, tot = s, 0, Decimal("0")
            last = s
            n += 1
            tot += Decimal(str(v)).quantize(Decimal("0.01"))
        k = (u, T0 + datetime.timedelta(seconds=start),
             T0 + datetime.timedelta(seconds=last + 300))
        exp[k] = (n, tot)
    assert got == exp
