"""spark-submit entry point: full KG-construction pipeline.

Usage (cluster):
    python tools/make_package.py                       # -> dist/sigraph_spark.zip
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_pipeline.py --pages <iceberg-or-parquet-path> \\
        --workdir /data/kg --shuffle-partitions 2000

Local smoke:
    python jobs/run_pipeline.py --synthetic-sf 0.001 --workdir /tmp/kg

Every stage checkpoints to ``workdir`` with a lineage manifest and resumes
idempotently (sigraph_spark.plans.pipeline). Shuffle partitions should be
~2-3x total executor cores at cluster scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running as a plain script puts jobs/ on sys.path; add the repo root so the
# package resolves (under spark-submit the --py-files zip provides it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--warc-dir", help="directory of WARC/1.0 segments "
                    "(plain or per-record gzip; one task per segment)")
    ap.add_argument("--synthetic-sf", type=float, help="generate synthetic pages at this sf")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sigraph_spark.plans.pipeline import run_pipeline
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="sigraph-kg-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.warc_dir:
        from sigraph_spark.sources.warc import (
            read_warc10_segments, warc_pages,
        )

        segs = (
            spark.read.format("binaryFile")
            .load(args.warc_dir)
            .selectExpr("path as segment", "content")
        )
        pages = warc_pages(read_warc10_segments(segs))
    elif args.synthetic_sf:
        from sigraph_spark.corpus import gen_pages

        pages = gen_pages(spark, sf=args.synthetic_sf)
    else:
        ap.error("one of --pages / --warc-dir / --synthetic-sf is required")

    t0 = time.monotonic()
    out = run_pipeline(spark, pages, args.workdir)
    stats = {name: df.count() for name, df in out.items()}
    stats["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
