"""spark-submit entry point: fold ONE crawl delta into persistent KG state.

The continuous-crawl append path (sigraph_spark.plans.incremental): each
invocation extracts + triple-parses only the delta, links it incrementally
against the stored entity state (unseen entities only — the corpus is
never re-signed), and merges the canonical edges cumulatively. Replaying
a ``--delta-id`` already in the ledger is a no-op.

Usage (cluster):
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_crawl_delta.py --pages <segment-path> \\
        --workdir /data/kg_state --delta-id CC-MAIN-2024-10-seg-00042

Local smoke (two synthetic halves):
    python jobs/run_crawl_delta.py --synthetic-sf 0.001 --synthetic-half 0 \\
        --workdir /tmp/crawl --delta-id seg-0
    python jobs/run_crawl_delta.py --synthetic-sf 0.001 --synthetic-half 1 \\
        --workdir /tmp/crawl --delta-id seg-1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="delta pages table path")
    ap.add_argument("--synthetic-sf", type=float, help="synthetic corpus sf")
    ap.add_argument("--synthetic-half", type=int, choices=(0, 1),
                    help="which url-hash half of the synthetic corpus")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--delta-id", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sigraph_spark.plans.incremental import apply_crawl_delta
    from sigraph_spark.session import build_session

    spark = build_session(
        "sigraph-crawl-delta",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")
    if args.pages and args.synthetic_sf is not None:
        # silently preferring one source would burn the delta-id in the
        # ledger against the wrong data — refuse ambiguous invocations
        ap.error("--pages and --synthetic-sf are mutually exclusive")
    if args.synthetic_sf is not None:
        from sigraph_spark.corpus import gen_pages

        pages = gen_pages(spark, sf=args.synthetic_sf)
        if args.synthetic_half is not None:
            pages = pages.filter(
                F.pmod(F.xxhash64("url"), F.lit(2)) == args.synthetic_half
            )
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synthetic-sf is required")

    os.makedirs(args.workdir, exist_ok=True)
    t0 = time.monotonic()
    report = apply_crawl_delta(spark, pages, args.workdir, args.delta_id)
    if report is None:
        report = {"delta_id": args.delta_id, "replay_noop": True}
    report["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
