"""Skewed-corpus soak (VERDICT r2 item 4).

Runs the FULL checkpointed KG pipeline twice at the given scale factor —
once over the uniform synthetic corpus, once over the Zipfian variant
(one head entity injected into ~30% of pages) — and records per-stage
wall times (from the stage manifests), the auto-salting decision the
pipeline made, and the zipf/uniform ratio per stage. Writes BENCH_skew.json
at the repo root.

Pass criterion: no stage regresses more than 2x under skew at equal scale.

Usage: python tools/bench_skew.py [sf]    # default 1.0 (10x bench scale)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from sigraph_spark.corpus import gen_pages, gen_pages_zipf, pages_count
    from sigraph_spark.plans.pipeline import read_manifest, run_pipeline
    from sigraph_spark.session import build_session

    spark = build_session("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/skew_soak")
    stages = ["s1_docs", "s2_triples", "s3_mapping", "s4_edges", "s4_adjacency"]

    # discarded warmup: JIT/codegen/Arrow paths warm BEFORE the first timed
    # leg, else the cold first variant inflates every later ratio's
    # denominator and a real zipf regression could hide under JVM warm-up
    warm_wd = os.path.join(root, "_warmup")
    shutil.rmtree(warm_wd, ignore_errors=True)
    run_pipeline(spark, gen_pages(spark, sf=sf / 100), warm_wd,
                 input_fingerprint="warmup")
    shutil.rmtree(warm_wd, ignore_errors=True)

    report: dict = {"sf": sf, "pages": pages_count(sf), "variants": {}}
    variants = (
        # bounded object pool: isolates FREQUENCY skew (one entity in ~30%
        # of pages) — this leg carries the pass criterion
        ("uniform", lambda s, sf: gen_pages(s, sf=sf), sf),
        ("zipf", lambda s, sf: gen_pages_zipf(s, sf=sf), sf),
        # unbounded object pool at sf/10: vocabulary-explosion stressor
        # (templated entity family) — informational, exercises the LSH
        # hot-bucket guard at scale
        ("zipf_vocab", lambda s, sf: gen_pages_zipf(s, sf=sf, obj_pool=None),
         sf / 10),
    )
    for variant, gen, vsf in variants:
        wd = os.path.join(root, variant)
        shutil.rmtree(wd, ignore_errors=True)
        # materialize the corpus OUTSIDE the timed region: generation
        # (html decode/inject/encode for the zipf legs) must not be
        # charged to s1, and reading a parquet crawl table is the real
        # production shape anyway
        # cache key includes the scale factor: re-running at a different sf
        # must regenerate, not silently reuse the previous run's corpus;
        # the _SUCCESS marker guards against a partially-written dir from
        # an interrupted generation
        pages_dir = os.path.join(root, f"pages_{variant}_sf{vsf}")
        if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
            gen(spark, vsf).write.mode("overwrite").parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        t0 = time.monotonic()
        out = run_pipeline(
            spark, pages, wd, input_fingerprint=f"skew-{variant}-{vsf}"
        )
        n_edges = out["edges"].count()
        wall = round(time.monotonic() - t0, 2)
        stage_walls = {
            s: read_manifest(os.path.join(wd, s))["wall_s"] for s in stages
        }
        madj = read_manifest(os.path.join(wd, "s4_adjacency"))
        report["variants"][variant] = {
            "sf": vsf,
            "wall_s": wall,
            "edges": n_edges,
            "stages": stage_walls,
            "salting": madj.get("salting"),
        }
        print(json.dumps({variant: report["variants"][variant]}), flush=True)

    u = report["variants"]["uniform"]["stages"]
    z = report["variants"]["zipf"]["stages"]
    ratios = {s: round(z[s] / max(u[s], 0.01), 3) for s in stages}
    report["stage_ratios_zipf_over_uniform"] = ratios
    report["max_ratio"] = max(ratios.values())

    # --- graph-algorithm skew leg (VERDICT r3 item 6) ----------------------
    # The wedge joins in triangles/k-truss and the contribution joins in
    # HITS are the skew-sensitive spots; degree orientation (hub edges
    # orient INTO the hub, so hub-middle wedges vanish) and map-side
    # fixed-point aggs must absorb a hub appearing in ~30% of edges.
    from pyspark.sql import functions as F

    from sigraph_spark.operators.graphalgo import (
        hits, ktruss, triangle_count,
    )

    n_edges = max(20_000, int(200_000 * sf))
    n_nodes = max(1_000, n_edges // 10)

    def gen_graph(n: int, zipf: bool):
        e = spark.range(n)
        h1 = F.pmod(
            F.xxhash64((F.col("id") * 2 + 1).cast("string")), F.lit(n_nodes)
        )
        h2 = F.pmod(
            F.xxhash64((F.col("id") * 2 + 2).cast("string")), F.lit(n_nodes)
        )
        src = F.when(F.col("id") % 10 < 3, F.lit(0)).otherwise(h1) if zipf else h1
        return (
            e.select(
                src.cast("string").alias("src"),
                h2.cast("string").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    algos = (
        ("triangles", lambda g: triangle_count(g).count()),
        ("ktruss", lambda g: ktruss(g, k=4).count()),
        ("hits", lambda g: hits(g, rounds=4).count()),
    )
    warm = gen_graph(2_000, False)  # discarded warmup leg, same reason as above
    for _, fn in algos:
        fn(warm)
    galgo: dict = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for variant in ("uniform", "zipf"):
        g = gen_graph(n_edges, variant == "zipf")
        times = {"distinct_edges": g.count()}
        for name, fn in algos:
            best = None
            for _ in range(reps):  # min-of-reps: the box has 2-4x noise
                t0 = time.monotonic()
                fn(g)
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 2)
        galgo[variant] = times
        print(json.dumps({f"graph_{variant}": times}), flush=True)
    gratios = {
        name: round(galgo["zipf"][name] / max(galgo["uniform"][name], 0.01), 3)
        for name, _ in algos
    }
    report["graph_algo"] = {
        "edges_generated": n_edges,
        "variants": galgo,
        "ratios_zipf_over_uniform": gratios,
        "max_ratio": max(gratios.values()),
    }
    # ---- sessionize leg: session_window merging under a hot user -------
    # a zipf user stream puts ~30% of ALL events on one key; the
    # session-window aggregation must absorb it via map-side partial
    # session merging (sessions of the hot key pre-merge per partition
    # before the shuffle), not serialize on one reducer
    from sigraph_spark.streaming.windows import sessionize

    n_events = max(50_000, int(500_000 * sf))

    def gen_events(n: int, zipf: bool):
        e = spark.range(n)
        uid = F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(997))
        if zipf:
            uid = F.when(F.col("id") % 10 < 3, F.lit(0)).otherwise(uid)
        return e.select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.pmod(F.xxhash64((F.col("id") + 7).cast("string")),
                         F.lit(86_400 * 30))
            ).alias("ts"),
            uid.alias("user_id"),
            (F.pmod(F.xxhash64((F.col("id") + 13).cast("string")),
                    F.lit(10_000)) / 100.0).alias("value"),
        ).localCheckpoint(eager=True)

    sessionize(gen_events(2_000, False), gap="5 minutes").count()  # warmup
    sess: dict = {}
    for variant in ("uniform", "zipf"):
        ev = gen_events(n_events, variant == "zipf")
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            sessionize(ev, gap="5 minutes").count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        sess[variant] = round(best, 2)
        print(json.dumps({f"sessionize_{variant}": sess[variant]}), flush=True)
    sess_ratio = round(sess["zipf"] / max(sess["uniform"], 0.01), 3)
    report["sessionize"] = {
        "events": n_events,
        "variants": sess,
        "ratio_zipf_over_uniform": sess_ratio,
    }
    report["regression_ok"] = (
        report["max_ratio"] <= 2.0
        and max(gratios.values()) <= 2.0
        and sess_ratio <= 2.0
    )
    # the zipf corpus carries MORE data (extra sentence in 30% of pages),
    # so a ratio modestly above 1.0 is the extra work, not the skew
    hot_salt = report["variants"]["zipf"]["salting"]
    report["hot_entity_detected"] = bool(
        hot_salt and any(
            "hotbot" in str(t.get("key", "")).lower()
            for t in hot_salt.get("top_degrees", [])
        )
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_skew.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "sf": sf,
        "max_ratio": report["max_ratio"],
        "regression_ok": report["regression_ok"],
        "hot_entity_detected": report["hot_entity_detected"],
        "zipf_salt_buckets": hot_salt.get("salt_buckets") if hot_salt else None,
    }))
    return 0 if report["regression_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
