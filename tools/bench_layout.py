"""Layout-key pruning on real parquet row groups: the IO number a
100 TB design review asks for.

tests/test_layout.py proves the partition-span PROPERTY (a Z-ordered
layout bounds every keyed column's range per partition); this tool
turns it into measured bytes. The same deterministic table is written
three ways — sorted by ``x`` only, Z-ordered over ``(x, y)``, and
Hilbert-ordered over ``(x, y)`` — as 64 parquet files each (one row
group per file, so parquet min/max row-group statistics ARE the
file-level pruning unit, exactly like a 100 TB table's row groups).
Two scans run against each layout with filter pushdown:

* ``box``   — ``x`` AND ``y`` each restricted to 1/16 of their domain.
* ``y_only``— the OFF-SORT key alone: the scan a single-column-sorted
  layout cannot prune at all.

Metrics come from Spark's own stage metrics (UI REST API, the
tools/bench_fusedscan.py methodology); each scan aggregates
``length(payload)`` so the (md5-incompressible) payload column must be
materialized for every surviving row group. Two IO measures, because
local-mode ``inputBytes`` UNDERCOUNTS absolute data-page IO (a full
scan of this 64 MB table reports ~350 KB — the vectorized reader's
buffer path bypasses the tracked FS statistics) while staying
internally consistent across layouts for the same query shape:

* ``records_read`` (stage ``inputRecords``) — rows actually
  materialized from parquet after row-group/page skipping; exact.
* ``input_bytes`` — the raw metric, meaningful as a RATIO between
  layouts only.
* ``est_data_bytes`` — records_read/total_rows x on-disk layout bytes
  (rows are fixed-width here, so this is the honest absolute number).

Parity: all layouts must return identical row counts and payload sums.

Pass criteria (exit 1 otherwise): parity holds; on the ``y_only`` scan
both multi-dimensional layouts prune >= 2x vs the x-sorted layout in
BOTH records_read and input_bytes (the verdict's bar — in practice
~3-6x: with 64 files a z/hilbert file fixes a ~3-bit prefix of EACH
coordinate, so a 1/16 y-range touches ~1/8-1/4 of files vs 16/16 for
the x-sort).

Contention-insensitive by design: bytes read do not depend on host
load, only wall times do (reported for color, never gated).

Usage: python tools/bench_layout.py  -> writes BENCH_layout.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BITS = 10           # x, y in [0, 1024)
N_ROWS = 2_000_000
N_FILES = 64
SEL = 64            # query window width: 64/1024 = 1/16 of the domain


def main() -> None:
    from pyspark.sql import functions as F

    from sigraph_spark.operators.layout import (
        cluster_by_zorder,
        with_hilbert_key,
    )
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="bench-layout",
        extra_conf={
            "spark.ui.enabled": "true",  # stage-metrics source
            # keep exactly N_FILES output files per layout — AQE would
            # coalesce the tiny range shuffle into a handful of files
            # and blur the pruning granularity under measurement
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]

    # Deterministic table: two INDEPENDENT uniform keys (multiplicative
    # hashing of the row id by distinct odd constants) + an
    # incompressible payload so pruned bytes are real data, not
    # dictionary-compressed padding.
    dom = 1 << BITS
    base = (
        spark.range(N_ROWS)
        .select(
            (F.col("id") * 2654435761 % dom).alias("x"),
            (F.col("id") * 1099087573 % dom).alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )

    root = "/tmp/bench_layout"
    shutil.rmtree(root, ignore_errors=True)
    layouts = {
        "sort_x": base.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x"),
        "zorder": cluster_by_zorder(
            base, [F.col("x"), F.col("y")], N_FILES, bits=BITS
        ).drop("_zkey"),
        "hilbert": with_hilbert_key(base, "x", "y", bits=BITS)
        .repartitionByRange(N_FILES, "hkey")
        .sortWithinPartitions("hkey")
        .drop("hkey"),
    }
    for name, df in layouts.items():
        df.write.parquet(f"{root}/{name}")

    def _stages() -> dict:
        # the UI reports a stage "complete" slightly AFTER the action
        # returns — settle first or a scan's bytes land on the next
        # measurement (observed: a filtered scan "reading more" than
        # the preceding full scan)
        for _ in range(100):
            act = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages?status=active"
                )
            )
            if not act:
                break
            time.sleep(0.05)
        time.sleep(0.2)
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        return {s["stageId"]: s for s in json.load(urllib.request.urlopen(url))}

    x0 = y0 = (dom - SEL) // 2  # center box, away from clamp edges
    queries = {
        "box": lambda d: d.where(
            F.col("x").between(x0, x0 + SEL - 1)
            & F.col("y").between(y0, y0 + SEL - 1)
        ),
        "y_only": lambda d: d.where(F.col("y").between(y0, y0 + SEL - 1)),
    }

    def measured(df) -> dict:
        before = _stages()
        t0 = time.monotonic()
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.length("payload")).alias("psum"),
        ).collect()[0]
        wall = time.monotonic() - t0
        new = [s for k, s in _stages().items() if k not in before]
        return {
            "rows": row["rows"],
            "payload_sum": row["psum"],
            "records_read": sum(s.get("inputRecords", 0) for s in new),
            "input_bytes": sum(s.get("inputBytes", 0) for s in new),
            "wall_s": round(wall, 2),
        }

    results: dict[str, dict] = {}
    for lname in layouts:
        table = spark.read.parquet(f"{root}/{lname}")
        disk = sum(
            os.path.getsize(os.path.join(f"{root}/{lname}", p))
            for p in os.listdir(f"{root}/{lname}")
            if p.endswith(".parquet")
        )
        results[lname] = {"disk_bytes": disk}
        for qname, q in queries.items():
            m = measured(q(table))
            m["est_data_bytes"] = int(disk * m["records_read"] / N_ROWS)
            results[lname][qname] = m

    parity = all(
        results[l][q][k] == results["sort_x"][q][k]
        for l in results
        for q in queries
        for k in ("rows", "payload_sum")
    )
    ratios = {
        q: {
            l: {
                met: round(
                    results["sort_x"][q][met]
                    / max(results[l][q][met], 1),
                    2,
                )
                for met in ("records_read", "input_bytes")
            }
            for l in ("zorder", "hilbert")
        }
        for q in queries
    }
    out = {
        "rows": N_ROWS,
        "files_per_layout": N_FILES,
        "bits": BITS,
        "window": f"{SEL}/{dom} per key",
        "parity": parity,
        "layouts": results,
        "pruned_vs_sort_x": ratios,
    }
    with open(os.path.join(REPO, "BENCH_layout.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    ok = parity and all(
        ratios["y_only"][l][met] >= 2.0
        for l in ("zorder", "hilbert")
        for met in ("records_read", "input_bytes")
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
