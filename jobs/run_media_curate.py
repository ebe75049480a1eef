"""spark-submit entry point: multimodal (media) curation pipeline.

Usage (cluster):
    spark-submit --py-files dist/sigraph_spark.zip \\
        jobs/run_media_curate.py --media <parquet-path> \\
        --workdir /data/media_curate --shuffle-partitions 2000

Local smoke:
    python jobs/run_media_curate.py --synthetic-n 600 --workdir /tmp/mcur \\
        --master 'local[8]' --shuffle-partitions 8

Stages (metadata sniff -> perceptual-hash band index -> near-dup
pairs -> keeplist) checkpoint with chained-fingerprint manifests and
resume idempotently (see ``plans/media.py``); the printed JSON is the
media curation report. ``--synthetic-n`` builds a deterministic mixed
corpus — PNG/BMP pairs sharing pixels, WAV/FLAC pairs sharing PCM,
and undecodable junk — so planted cross-format duplicates exercise
both dedup planes end to end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synthetic_media(spark, n: int):
    from pyspark.sql import functions as F  # noqa: F401

    def gen(batches):
        import numpy as np
        import pandas as pd

        from sigraph_spark.operators.audiofp import encode_wav16
        from sigraph_spark.operators.flac import encode_flac
        from sigraph_spark.operators.multimodal import encode_bmp, encode_png

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                g = i // 2  # consecutive ids share content across formats
                if i % 10 == 9:
                    rows.append({"media_id": f"m-{i:06d}",
                                 "payload": b"\x00junk" * 5 + bytes([g % 251])})
                    continue
                if g % 2 == 0:  # image pair: png + bmp of the same pixels
                    rng = np.random.default_rng(g)
                    w, h = 20 + g % 13, 14 + g % 9
                    rgb = rng.integers(0, 256, size=(h, w, 3),
                                       dtype=np.uint8).tobytes()
                    enc = encode_png if i % 2 == 0 else encode_bmp
                    rows.append({"media_id": f"m-{i:06d}",
                                 "payload": enc(w, h, rgb)})
                else:  # audio pair: wav + flac of the same PCM
                    rng = np.random.default_rng(100_000 + g)
                    x = rng.integers(-9000, 9000, size=4608).astype(np.int64)
                    p = (encode_wav16(8000, x) if i % 2 == 0
                         else encode_flac(8000, x))
                    rows.append({"media_id": f"m-{i:06d}", "payload": p})
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 8).mapInPandas(
        gen, "media_id string, payload binary").localCheckpoint(eager=True)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", help="media parquet (media_id, payload)")
    ap.add_argument("--synthetic-n", type=int,
                    help="generate N synthetic mixed payloads (testing)")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--delta-id",
                    help="apply as an O(delta) append to the media-dedup "
                         "state instead of the batch pipeline; replays "
                         "of an applied id are no-ops")
    ap.add_argument("--synthetic-half", type=int, choices=(0, 1),
                    help="with --synthetic-n: keep only even (0) or odd "
                         "(1) ids — cross-format pairs then SPAN deltas")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if not args.media and not args.synthetic_n:
        ap.error("need --media or --synthetic-n")

    from pyspark.sql import functions as F

    from sigraph_spark.plans.media import run_media_curation
    from sigraph_spark.session import build_session

    spark = build_session(
        app_name="sigraph-media-curation",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    media = (spark.read.parquet(args.media) if args.media
             else _synthetic_media(spark, args.synthetic_n))
    if args.synthetic_half is not None:
        media = media.filter(F.expr(
            f"CAST(substring(media_id, 3) AS INT) % 2 = {args.synthetic_half}"
        ))

    if args.delta_id:
        from sigraph_spark.plans.media_delta import (
            apply_media_delta,
            media_delta_keeplist,
        )

        t0 = time.monotonic()
        rep = apply_media_delta(spark, media, args.workdir, args.delta_id,
                                max_hamming=args.max_hamming)
        if rep is None:
            print(json.dumps({"replay_noop": True,
                              "delta_id": args.delta_id}))
            return 0
        keep = media_delta_keeplist(spark, args.workdir)
        rep["kept"] = keep.filter(F.col("keep")).count()
        rep["dropped"] = keep.filter(~F.col("keep")).count()
        rep["wall_s"] = round(time.monotonic() - t0, 3)
        print(json.dumps(rep))
        return 0

    t0 = time.monotonic()
    out = run_media_curation(spark, media, args.workdir,
                             max_hamming=args.max_hamming)
    kinds = {r["kind"]: r["n"] for r in
             out["sniff"].groupBy("kind").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    report = {
        "input": media.count(),
        "sniff": kinds,
        "index_rows": out["index"].count(),
        "pairs": out["pairs"].count(),
        "kept": out["keep"].filter(F.col("keep")).count(),
        "dropped": out["keep"].filter(~F.col("keep")).count(),
        "wall_s": round(time.monotonic() - t0, 3),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
