"""spark-submit entry point: training-data curation pipeline.

Usage (cluster):
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_curation.py --docs <parquet-path> --workdir /data/curate \\
        [--evalset <parquet-path>] [--ctx-len 2048] --shuffle-partitions 2000

Local smoke:
    python jobs/run_curation.py --docs /root/testdata/sf0.01/documents.parquet \\
        --workdir /tmp/curate --evalset-slice 37

Stages (normalize -> funnel -> exact dedup -> near-dup -> decontaminate
-> sequence packing) checkpoint with chained-fingerprint manifests and
resume idempotently; the printed JSON is the curation funnel report
(docs surviving each stage).
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
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text, lang)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--evalset", help="eval/benchmark docs parquet for decontamination")
    ap.add_argument("--evalset-slice", type=int,
                    help="use doc_id %% N == 0 of --docs as the eval set (testing)")
    ap.add_argument("--ctx-len", type=int, default=2048)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sigraph_spark.plans.pipeline import run_curation
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="sigraph-curation",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.docs)
    evalset = None
    if args.evalset:
        evalset = spark.read.parquet(args.evalset)
    elif args.evalset_slice:
        evalset = docs.filter(F.col("doc_id") % args.evalset_slice == 0)
        docs = docs.filter(F.col("doc_id") % args.evalset_slice != 0)

    t0 = time.monotonic()
    out = run_curation(spark, docs, args.workdir, evalset=evalset,
                       ctx_len=args.ctx_len)
    report = {
        "input": docs.count(),
        "pass_funnel": out["funnel"].filter(F.col("verdict") == "pass").count(),
        "after_exact": out["exact"].filter(
            F.col("doc_id") == F.col("canonical_id")
        ).count(),
        "after_neardup": out["neardup"].filter(
            F.col("doc_id") == F.col("canonical_id")
        ).count(),
        "clean": out["clean"].count(),
        "packed_chunks": out["packed"].agg(
            F.max(F.col("start_offset") + F.col("n_tokens"))
        ).collect()[0][0],
    }
    report["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(report, default=int))
    return 0


if __name__ == "__main__":
    sys.exit(main())
