"""KG post-processing plan (plans/postprocess.py)."""

import json
import os

from conftest import spark  # noqa: F401

TRIPLES = "url string, step int, actor string, verb string, object string"

ROWS = [
    ("https://a.example/p/1", 1, "x", "create", "f.exe"),
    ("https://a.example/p/1", 2, "x", "create", "g.exe"),
    ("https://b.example/p/2", 1, "x", "create", "f.exe"),
    ("https://b.example/p/2", 2, "y", "launch", "http://c.example/h.php"),
    ("https://c.example/p/3", 1, "y", "launch", "http://c.example/h.php"),
]


def _run(spark, workdir, triples):
    from sigraph_spark.plans.postprocess import run_kg_post

    tables = run_kg_post(spark, triples, workdir)
    return {k: v.count() for k, v in tables.items()}, tables


def test_kg_post_stages_and_resume(spark, tmp_path):
    t = spark.createDataFrame(ROWS, TRIPLES)
    wd = str(tmp_path / "kgpost")
    counts1, tables = _run(spark, wd, t)
    # hosts are the sources: a.example, b.example, c.example
    assert counts1["claims"] == 5
    assert counts1["fused"] == 2  # distinct (s,p): (x,create), (y,launch)
    srcs = {r["source"] for r in tables["claims"].collect()}
    assert srcs == {"a.example", "b.example", "c.example"}
    # fused winner for (x, create): f.exe (2 sources vs 1)
    fused = {(r["subject"], r["predicate"]): r["fused_object"]
             for r in tables["fused"].collect()}
    assert fused[("x", "create")] == "f.exe"
    # typed literals: file + url rows present
    lits = {(r["littype"], r["canonical"])
            for r in tables["literals"].collect()}
    assert ("file", "f.exe") in lits and ("url", "http://c.example/h.php") in lits
    # schema report: create is non-functional (x has 2 objects) with a
    # file range; launch is functional with a url range
    sch = {r["predicate"]: (r["is_functional"], r["range_type"])
           for r in tables["schema"].collect()}
    assert sch["create"] == (False, "file")
    assert sch["launch"] == (True, "url")

    # resume: manifests unchanged, second run returns identical counts
    m_before = json.load(open(os.path.join(wd, "k2_fused", "_manifest.json")))
    counts2, _ = _run(spark, wd, t)
    m_after = json.load(open(os.path.join(wd, "k2_fused", "_manifest.json")))
    assert counts2 == counts1
    assert m_before == m_after


def test_kg_post_invalidation_on_content_edit(spark, tmp_path):
    t = spark.createDataFrame(ROWS, TRIPLES)
    wd = str(tmp_path / "kgpost2")
    _run(spark, wd, t)
    fp1 = json.load(open(os.path.join(wd, "k1_claims", "_manifest.json")))
    # in-place SAME-LENGTH object edit, same urls/steps: chain must
    # invalidate (a length proxy would miss this)
    edited = [list(r) for r in ROWS]
    assert len("q.exe") == len(edited[0][4])
    edited[0][4] = "q.exe"
    t2 = spark.createDataFrame([tuple(r) for r in edited], TRIPLES)
    _run(spark, wd, t2)
    fp2 = json.load(open(os.path.join(wd, "k1_claims", "_manifest.json")))
    assert fp1["input_fingerprint"] != fp2["input_fingerprint"]
