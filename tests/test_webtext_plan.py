from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sigraph_spark.plans.webtext import run_webtext_kg


def _pages(spark):
    from jobs.run_webtext_kg import synthetic_webtext_pages

    return synthetic_webtext_pages(spark, 0.0001)  # 64 pages


def _manifest(workdir, stage):
    with open(os.path.join(workdir, stage, "_manifest.json")) as fh:
        return json.load(fh)


def test_webtext_plan_all_views_fire_and_fuse(spark, tmp_path):
    wd = str(tmp_path / "wk")
    out = run_webtext_kg(spark, _pages(spark), wd, input_fingerprint="t:v1")
    by_source = {
        r["source"] for r in out["claims"].select("source").distinct().collect()
    }
    assert by_source == {
        "sentence", "table", "hearst", "jsonld", "microdata", "rdfa",
        "meta", "list", "dl", "quote",
    }
    # the attributed-statement channel: speaker subjects, verb predicates
    qt = out["claims"].filter("source = 'quote'")
    assert {r["subject"] for r in qt.select("subject").distinct().collect()} \
        == {"Alice Carter"}
    # the planted list block: membership claims on the racks class
    lst = out["claims"].filter("source = 'list'")
    assert {r["predicate"] for r in lst.select("predicate").distinct().collect()} \
        == {"member_of"}
    # the planted cross-CHANNEL conflict: table/jsonld/microdata/rdfa
    # disagree on (srv-*, os) for some pages, so fusion sees >1 source
    os_claims = out["claims"].filter(
        "predicate = 'os' AND source IN ('jsonld', 'microdata', 'rdfa', 'table')"
    )
    assert {r["source"] for r in os_claims.select("source").distinct().collect()} \
        == {"jsonld", "microdata", "rdfa", "table"}
    fused = out["fused"]
    assert fused.count() > 0
    # cross-page table conflicts exist (same srv-N, different os) and fuse
    # resolves them deterministically
    assert fused.filter("n_objects > 1").count() > 0
    assert set(fused.columns) == {
        "subject", "predicate", "fused_object", "votes", "weight", "n_objects",
    }


def test_webtext_plan_resumes_and_invalidates(spark, tmp_path):
    wd = str(tmp_path / "wk2")
    pages = _pages(spark)
    run_webtext_kg(spark, pages, wd, input_fingerprint="t:v1")
    m1 = {s: _manifest(wd, s) for s in
          ("w0_scan", "w1_docs", "w2_sent", "w4_hearst", "w9_html_claims",
           "w8_quotes", "w5_claims", "w6_fused")}
    # resume: same fingerprint -> every stage skipped (manifests untouched)
    run_webtext_kg(spark, pages, wd, input_fingerprint="t:v1")
    m2 = {s: _manifest(wd, s) for s in m1}
    assert m1 == m2
    # changed input fingerprint -> w0 recomputes; chained fingerprints
    # keep the downstream stable ONLY if upstream outputs are identical
    run_webtext_kg(spark, pages, wd, input_fingerprint="t:v2")
    m3 = _manifest(wd, "w0_scan")
    assert m3["input_fingerprint"].startswith("t:v2")
    # identical content -> identical output fingerprint -> w2 resumed as-is
    assert _manifest(wd, "w2_sent") == m1["w2_sent"]


def test_webtext_delta_matches_from_scratch(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from sigraph_spark.plans.webtext import (
        apply_webtext_delta, webtext_state_tables,
    )

    pages = _pages(spark).localCheckpoint(eager=True)
    parity = F.pmod(F.xxhash64("url"), F.lit(2))
    wd = str(tmp_path / "wtd")
    r0 = apply_webtext_delta(spark, pages.filter(parity == 0), wd, "seg-0")
    r1 = apply_webtext_delta(spark, pages.filter(parity == 1), wd, "seg-1")
    assert r0["new_claims"] > 0 and r1["new_claims"] > 0
    claims, fused = webtext_state_tables(spark, wd)

    # from-scratch run over the full corpus
    full = run_webtext_kg(spark, pages, str(tmp_path / "full"), "p:v1")
    assert sorted(map(tuple, claims.collect())) == sorted(
        map(tuple, full["claims"].collect())
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, full["fused"].collect())
    )
    # replay no-op + ledger
    assert apply_webtext_delta(spark, pages.filter(parity == 0), wd, "seg-0") is None
    r2 = apply_webtext_delta(spark, pages.limit(0), wd, "seg-2")
    assert r2["new_claims"] == 0 and r2["total_claims"] == r1["total_claims"]
    assert not os.path.isdir(os.path.join(wd, "v1", "fused"))
    assert os.path.isdir(os.path.join(wd, "v3", "fused"))
