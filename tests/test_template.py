"""Template fingerprinting (operators/template.py).

Pins the skeleton model: opening tags only (closing tags and text are
invisible), lowercase normalization, md5 portability shape, cluster
aggregation with min_pages cut and lexicographic exemplar, and the
zero-UDF / zero-shuffle fingerprint plan invariant.
"""

from __future__ import annotations

import hashlib

from sigraph_spark.operators.template import page_structure, template_clusters


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_skeleton_ignores_text_and_closing_tags(spark):
    out = {
        r["url"]: (r["n_tags"], r["template_id"])
        for r in page_structure(
            _pages(spark, [
                ("u1", "<html><body><p>hello</p></body></html>"),
                ("u2", "<html><body><p>entirely different words</p>"),
                ("u3", "<HTML><BODY><P>case</P>"),  # lowercased
                ("u4", "<html><body><div>x</div></body></html>"),
            ])
        ).collect()
    }
    assert out["u1"] == out["u2"] == out["u3"]
    assert out["u4"] != out["u1"]
    assert out["u1"][0] == 3
    # md5 is the documented portable fingerprint
    assert out["u1"][1] == hashlib.md5(b"html,body,p").hexdigest()


def test_clusters_min_pages_and_exemplar(spark):
    structs = page_structure(
        _pages(spark, [
            ("b", "<html><p>x</p>"),
            ("a", "<html><p>y</p>"),
            ("c", "<div><span>z</span></div>"),  # singleton: dropped
        ])
    )
    got = [
        (r["n_pages"], r["n_tags"], r["exemplar"])
        for r in template_clusters(structs).collect()
    ]
    assert got == [(2, 2, "a")]


def test_binary_html_column(spark):
    df = page_structure(
        _pages(spark, [("u1", "<html><p>x</p>")]).select(
            "url", __import__("pyspark.sql.functions", fromlist=["encode"])
            .encode("html", "UTF-8").alias("html")
        )
    )
    assert df.collect()[0]["n_tags"] == 2


def test_fingerprint_plan_zero_udf_zero_shuffle(spark):
    df = page_structure(_pages(spark, [("u1", "<html><p>x</p>")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_novel_templates_anti_join(spark):
    from sigraph_spark.operators.template import novel_templates, page_structure

    known = page_structure(_pages(spark, [
        ("k1", "<html><body><p>x</p></body></html>"),
    ]))
    delta = page_structure(_pages(spark, [
        ("d1", "<html><body><p>other words</p></body></html>"),  # known
        ("d2", "<div><span>new layout</span></div>"),
        ("d3", "<div><span>same new layout</span></div>"),
    ]))
    got = {(r["n_pages"], r["exemplar"])
           for r in novel_templates(delta, known).collect()}
    assert got == {(2, "d2")}  # singleton novel classes still surface
