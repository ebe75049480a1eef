"""Streaming webtext KG ingestion (streaming/webtext.py).

Pins stream == batch: two micro-batches folded through the streaming
sink must leave exactly the state a from-scratch run over the union
produces (claims AND fused), and a redelivered batch id must be a
ledger no-op.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _pages(spark):
    from jobs.run_webtext_kg import synthetic_webtext_pages

    return synthetic_webtext_pages(spark, 0.0001).localCheckpoint(True)


def test_stream_equals_batch_and_replay_noop(spark, tmp_path):
    from sigraph_spark.plans.webtext import (
        run_webtext_kg, webtext_state_tables,
    )
    from sigraph_spark.streaming.webtext import stream_webtext, webtext_batch

    pages = _pages(spark)
    parity = F.pmod(F.xxhash64("url"), F.lit(2))
    src = str(tmp_path / "drop")
    wd = str(tmp_path / "state")

    # two drops, one availableNow stream each -> two micro-batches
    pages.filter(parity == 0).write.mode("append").parquet(src)
    stream_webtext(spark, src, wd).awaitTermination(120)
    pages.filter(parity == 1).write.mode("append").parquet(src)
    stream_webtext(spark, src, wd).awaitTermination(120)

    with open(os.path.join(wd, "_state.json")) as fh:
        st = json.load(fh)
    assert len(st["applied"]) == 2
    assert all(d.startswith("batch-") for d in st["applied"])

    claims, fused = webtext_state_tables(spark, wd)
    full = run_webtext_kg(spark, pages, str(tmp_path / "full"), "s:v1")
    assert sorted(map(tuple, claims.collect())) == sorted(
        map(tuple, full["claims"].collect())
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, full["fused"].collect())
    )

    # redelivery of an applied batch id (crash between state swap and
    # checkpoint commit) is a ledger no-op
    assert webtext_batch(pages.filter(parity == 0), 0, wd) is None
    # and a third empty trigger-once pass applies nothing new
    stream_webtext(spark, src, wd).awaitTermination(120)
    with open(os.path.join(wd, "_state.json")) as fh:
        assert len(json.load(fh)["applied"]) == 2
