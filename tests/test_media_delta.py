"""O(delta) media-dedup state (plans/media_delta.py) — delta-merged
pairs equal the from-scratch batch run, replay no-ops, and the derived
keeplist matches the batch pipeline's."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "jobs")


def _media(spark, n=48):
    from run_media_curate import _synthetic_media

    return _synthetic_media(spark, n)


def test_delta_equals_batch_and_replay_noop(spark, tmp_path):
    from sigraph_spark.plans.media import run_media_curation
    from sigraph_spark.plans.media_delta import (
        apply_media_delta,
        media_delta_keeplist,
        media_state_tables,
    )

    media = _media(spark, 48)
    # split so cross-format pairs SPAN the deltas: even ids (png/wav
    # members) first, odd ids (bmp/flac members) second
    half0 = media.filter(F.expr("CAST(substring(media_id, 3) AS INT) % 2 = 0"))
    half1 = media.filter(F.expr("CAST(substring(media_id, 3) AS INT) % 2 = 1"))
    wd = str(tmp_path / "mdelta")

    r0 = apply_media_delta(spark, half0, wd, "seg-0")
    assert r0 is not None and r0["new_pairs"] == 0  # no pairs within evens
    r1 = apply_media_delta(spark, half1, wd, "seg-1")
    assert r1 is not None and r1["new_pairs"] > 0

    # replay is a no-op
    assert apply_media_delta(spark, half0, wd, "seg-0") is None

    # delta-merged pairs == from-scratch batch pairs on the union
    batch = run_media_curation(spark, media, str(tmp_path / "mbatch"))
    exp_pairs = {(r["a"], r["b"], r["hamming"], r["plane"])
                 for r in batch["pairs"].collect()}
    stored = media_state_tables(spark, wd)
    got_pairs = {(r["a"], r["b"], r["hamming"], r["plane"])
                 for r in stored["pairs"].collect()}
    assert got_pairs == exp_pairs and len(exp_pairs) > 0

    # merged index == batch index
    exp_idx = {tuple(r) for r in batch["index"]
               .select("media_id", "plane", "h", "bi", "bv").collect()}
    got_idx = {tuple(r) for r in stored["index"]
               .select("media_id", "plane", "h", "bi", "bv").collect()}
    assert got_idx == exp_idx

    # derived keeplist == batch keeplist
    exp_keep = {(r["media_id"], r["keep"])
                for r in batch["keep"].collect()}
    got_keep = {(r["media_id"], r["keep"])
                for r in media_delta_keeplist(spark, wd).collect()}
    assert got_keep == exp_keep


def test_crash_orphan_gc(spark, tmp_path):
    import os

    from sigraph_spark.plans.media_delta import apply_media_delta

    media = _media(spark, 12)
    wd = str(tmp_path / "mgc")
    apply_media_delta(spark, media, wd, "seg-0")
    # simulate an interrupted apply: an orphan version dir
    os.makedirs(os.path.join(wd, "v99", "index"), exist_ok=True)
    apply_media_delta(spark, media, wd, "seg-0")  # replay triggers GC
    assert not os.path.isdir(os.path.join(wd, "v99"))
