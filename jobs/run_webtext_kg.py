"""spark-submit entry point: webtext multi-extractor KG assembly.

Usage (cluster):
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_webtext_kg.py --pages <parquet-path> --workdir /data/webkg \\
        --shuffle-partitions 2000

Local smoke (combined synthetic corpus — behavior sentences + planted
web tables + Hearst prose in ONE html per page):
    python jobs/run_webtext_kg.py --synthetic-sf 0.01 --workdir /tmp/webkg \\
        --master 'local[8]' --shuffle-partitions 8

Stages w1 (extract) -> {w2 sentence, w3 table, w4 hearst, w7 structured
(JSON-LD/microdata/meta)} claims -> w5 union -> w6 fused checkpoint with
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


def synthetic_webtext_pages(spark, sf: float):
    """Combined corpus: gen_pages html with the planted table markup, the
    Hearst prose paragraph AND a structured-data snippet (JSON-LD block +
    microdata scope + RDFa scope + OpenGraph meta tag + a headed
    list-page block + a definition-list infobox whose heading IS the
    srv subject, corroborating the JSON-LD dc claim cross-channel) plus
    an ATTRIBUTED QUOTE paragraph (the 'quote' claims channel; its
    verbs are outside the sentence whitelist so the channels stay
    disjoint) spliced in before </body> — every extractor view
    has signal in the SAME page, and none disturbs the others (table
    cells, list items and Hearst prose carry no whitelist verbs;
    gen_pages' template has no tables or lists; script bodies are
    stripped before sentence extraction). The structured snippet claims ``os`` on
    the FIRST table-row subject of the page (srv-<3i%97>): JSON-LD always
    says linux, microdata says linux on even pages and freebsd on odd
    ones, RDFa says linux except netbsd on i%3==0 pages — planting
    genuine cross-CHANNEL conflicts for fusion on top of the existing
    cross-page table conflicts."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from sigraph_spark.corpus import gen_pages

    gp = gen_pages(spark, sf=sf).select(
        "url", "warc_ts", F.decode("html", "UTF-8").alias("_h"), "lang"
    )
    tp = entry._webtext_table_pages(spark, sf=sf).select(
        "url",
        F.substring_index(
            F.substring_index(F.decode("html", "UTF-8"), "<body>", -1),
            "</body>", 1,
        ).alias("_tbody"),
    )
    hd = entry._hearst_corpus(spark, sf=sf).select(
        "url", F.col("text").alias("_htext")
    )
    i = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    srv = F.concat(F.lit("srv-"), ((i * 3) % 97).cast("string"))
    osmd = F.when(i % 2 == 0, F.lit("linux")).otherwise(F.lit("freebsd"))
    osrd = F.when(i % 3 == 0, F.lit("netbsd")).otherwise(F.lit("linux"))
    structured = F.concat(
        F.lit('<script type="application/ld+json">{"@id":"'), srv,
        F.lit('","@type":"Server","os":"linux","dc":"dc-'),
        (i % 7).cast("string"), F.lit('"}</script>'),
        F.lit('<div itemscope itemtype="https://schema.org/Server"'
              ' itemid="'), srv,
        F.lit('"><span itemprop="os">'), osmd,
        F.lit('</span><span itemprop="rack">r-'), (i % 23).cast("string"),
        F.lit("</span></div>"),
        F.lit('<div typeof="Server" resource="'), srv,
        F.lit('"><span property="os">'), osrd,
        F.lit('</span><span property="owner">team-'),
        (i % 11).cast("string"), F.lit("</span></div>"),
        F.lit('<meta property="og:title" content="Host '), srv, F.lit('">'),
        F.lit("<h2>List of Racks</h2><ul><li>r-"),
        (i % 23).cast("string"),
        F.lit("</li><li>r-"), ((i + 1) % 23).cast("string"),
        F.lit("</li></ul><h2>"), srv,
        F.lit("</h2><dl><dt>dc</dt><dd>dc-"), (i % 7).cast("string"),
        F.lit("</dd></dl>"),
    )
    combined = (
        gp.join(tp, "url").join(hd, "url")
        .select(
            "url", "warc_ts",
            F.encode(
                F.replace(
                    F.col("_h"),
                    F.lit("</body></html>"),
                    F.concat(
                        F.col("_tbody"), F.lit("<p>"), F.col("_htext"),
                        F.lit('</p><p>Alice Carter said "segment '),
                        (i % 17).cast("string"),
                        F.lit(' is stable."</p>'),
                        structured, F.lit("</body></html>"),
                    ),
                ),
                "UTF-8",
            ).alias("html"),
            F.lit(None).cast("string").alias("text"),
            "lang",
        )
    )
    return combined


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic-sf", type=float,
                    help="generate the combined synthetic corpus at this sf")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--delta-id", default=None,
                    help="apply the pages as ONE crawl delta into the "
                         "append-path state at --workdir (idempotency key)")
    ap.add_argument("--synthetic-half", type=int, choices=(0, 1), default=None,
                    help="with --synthetic-sf: keep only this xxhash64(url) "
                         "parity half (two-delta smoke)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.pages and args.synthetic_sf is None:
        ap.error("one of --pages / --synthetic-sf is required")

    from pyspark.sql import functions as F

    from sigraph_spark.plans.webtext import run_webtext_kg
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="sigraph-webtext-kg",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.pages:
        pages = spark.read.parquet(args.pages)
        fp = None
    else:
        pages = synthetic_webtext_pages(spark, args.synthetic_sf)
        fp = f"synthetic:{args.synthetic_sf}:v1"
    if args.synthetic_half is not None:
        pages = pages.filter(
            F.pmod(F.xxhash64("url"), F.lit(2)) == args.synthetic_half
        )

    if args.delta_id is not None:
        from sigraph_spark.plans.webtext import apply_webtext_delta

        t0 = time.monotonic()
        rep = apply_webtext_delta(spark, pages, args.workdir, args.delta_id)
        if rep is None:
            print(json.dumps({"replay_noop": True, "delta_id": args.delta_id}))
        else:
            rep["wall_s"] = round(time.monotonic() - t0, 3)
            print(json.dumps(rep))
        return 0

    t0 = time.monotonic()
    out = run_webtext_kg(spark, pages, args.workdir, input_fingerprint=fp)
    report = {name: df.count() for name, df in out.items()}
    report["by_source"] = {
        r["source"]: r["n"]
        for r in out["claims"].groupBy("source")
        .agg(F.count("*").alias("n")).collect()
    }
    report["conflicts_resolved"] = out["fused"].filter("n_objects > 1").count()
    report["wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
