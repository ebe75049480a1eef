"""spark-submit entry point: KG post-processing (fusion + audit).

Usage (cluster):
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_kg_post.py --triples <parquet-path> --workdir /data/kgpost \\
        --shuffle-partitions 2000

Local smoke (synthetic corpus; crawl-segment sources):
    python jobs/run_kg_post.py --synthetic-sf 0.01 --segments 5 \\
        --workdir /tmp/kgpost --master 'local[8]' --shuffle-partitions 8

Stages k1 (claims) -> k2 (fused) -> k3 (functional violations) ->
k4 (typed-literal dictionary) -> k5 (entity summaries) checkpoint with
chained-fingerprint manifests and resume idempotently. Prints one JSON
line of per-table row counts.
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
    ap.add_argument("--triples", help="triples parquet (url, step, actor, verb, object, context)")
    ap.add_argument("--synthetic-sf", type=float,
                    help="generate the synthetic corpus and extract triples at this sf")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--segments", type=int, default=None,
                    help="derive sources as trailing-int %% N crawl segments (synthetic corpora)")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.triples and args.synthetic_sf is None:
        ap.error("one of --triples / --synthetic-sf is required")

    from sigraph_spark.plans.postprocess import run_kg_post
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="sigraph-kg-post",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.triples:
        triples = spark.read.parquet(args.triples)
    else:
        from sigraph_spark.corpus import gen_pages
        from sigraph_spark.operators.extract import extract_pages
        from sigraph_spark.operators.triples import triples_from_docs

        pages = gen_pages(spark, sf=args.synthetic_sf)
        triples = triples_from_docs(
            extract_pages(pages).select("url", "text")
        ).localCheckpoint(eager=True)

    t0 = time.monotonic()
    tables = run_kg_post(
        spark, triples, args.workdir,
        segments=args.segments, top_k=args.top_k,
    )
    report = {name: df.count() for name, df in tables.items()}
    report["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
