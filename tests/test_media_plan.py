"""Media curation pipeline (plans/media.py + jobs/run_media_curate.py)
— stage semantics over a planted cross-format duplicate corpus, resume
== manifests unchanged, and the keeplist contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _media(spark, n=60):
    import sys

    sys.path.insert(0, "jobs")
    from run_media_curate import _synthetic_media

    return _synthetic_media(spark, n)


def test_media_curation_stages_resume_and_keeplist(spark, tmp_path):
    from sigraph_spark.plans.media import run_media_curation
    from sigraph_spark.plans.pipeline import read_manifest

    media = _media(spark, 60)
    wd = str(tmp_path / "mcur")
    out = run_media_curation(spark, media, wd)

    kinds = {r["kind"]: r["n"] for r in out["sniff"].groupBy("kind")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    # ids 9,19,...,59 are junk -> 6 unknown; the rest split by g parity
    assert kinds["unknown"] == 6
    assert kinds["image"] + kinds["audio"] == 54

    # planted pairs: g in [0,30), pair (2g, 2g+1) survives unless its
    # odd member was junked (2g+1 % 10 == 9 <=> g % 5 == 4) -> 24 pairs
    pairs = {(r["a"], r["b"]) for r in out["pairs"].collect()}
    exp = {(f"m-{2 * g:06d}", f"m-{2 * g + 1:06d}")
           for g in range(30) if g % 5 != 4}
    assert pairs == exp
    # every pair is an exact content match across formats -> hamming 0
    assert all(r["hamming"] == 0 for r in out["pairs"].collect())

    keep = {r["media_id"]: r["keep"] for r in out["keep"].collect()}
    assert len(keep) == 60
    for g in range(30):
        if g % 5 != 4:
            assert keep[f"m-{2 * g:06d}"] is True      # min-id rep
            assert keep[f"m-{2 * g + 1:06d}"] is False
    # junk rows keep themselves (no pairs)
    assert keep["m-000009"] is True

    # resume: second run skips every stage (manifests byte-identical)
    m_before = [read_manifest(str(tmp_path / "mcur" / s))
                for s in ("m1_sniff", "m2_index", "m3_pairs", "m4_keep")]
    out2 = run_media_curation(spark, media, wd)
    m_after = [read_manifest(str(tmp_path / "mcur" / s))
               for s in ("m1_sniff", "m2_index", "m3_pairs", "m4_keep")]
    assert m_before == m_after
    assert {(r["a"], r["b"]) for r in out2["pairs"].collect()} == exp


def test_media_index_feeds_incremental_probe(spark, tmp_path):
    """The m2 index IS the incremental path's input: probing a delta
    against it equals the full recompute restricted to new ids."""
    from sigraph_spark.operators.imagehash import (
        image_neardup,
        incremental_image_candidates,
    )
    from sigraph_spark.plans.media import run_media_curation

    media = _media(spark, 40)
    wd = str(tmp_path / "mc2")
    out = run_media_curation(spark, media, wd)
    stored = out["index"].filter(F.col("plane") == "image").select(
        F.col("media_id").alias("id"), F.col("h").alias("dh"), "bi", "bv")

    # a delta re-encoding of image group g=0's pixels as a new id
    import numpy as np

    from sigraph_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(0)
    w, h = 20, 14
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
    delta = spark.createDataFrame(
        [("new-copy", bytearray(encode_png(w, h, rgb)))],
        "media_id string, payload binary")

    pairs, _ = incremental_image_candidates(delta, stored)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert got == {("m-000000", "new-copy"), ("m-000001", "new-copy")}

    full = image_neardup(
        media.unionByName(delta)).filter(
        (F.col("a") == "new-copy") | (F.col("b") == "new-copy"))
    assert {(r["a"], r["b"]) for r in full.collect()} == got
