"""Definition-list fact extraction (operators/dlfacts.py).

Pins the infobox reading: heading subjects via the shared context fold
(unheaded blocks drop), positional dt/dd pairing with ragged-pad drops,
tag-strip + empty drops, dl_idx/pair_idx numbering, nested truncation,
claims shaping, and the zero-UDF / zero-shuffle plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.dlfacts import dl_claims, dl_facts


def _pages(spark, html: str, url: str = "u1"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def _rows(spark, html: str):
    return {
        (r["dl_idx"], r["pair_idx"], r["subject"], r["key"], r["value"])
        for r in dl_facts(_pages(spark, html)).collect()
    }


def test_full_page_semantics(spark):
    html = (
        "<dl><dt>orphan</dt><dd>x</dd></dl>"  # no heading: drops whole block
        "<h2>Server <b>Alpha</b></h2>"
        "<dl><dt>CPU</dt><dd>64-core</dd>"
        "<dt><i>RAM</i></dt><dd><a href='/r'>512 GiB</a></dd>"
        "<dt>empty</dt><dd></dd>"  # empty value: drops, consumes idx 2
        "<dt>tail-key</dt></dl>"  # unpaired dt: NULL dd, drops
        "<h3>Server Beta</h3>"
        "<dl><dt>OS</dt><dd>linux</dd></dl>"
    )
    assert _rows(spark, html) == {
        (1, 0, "Server Alpha", "CPU", "64-core"),
        (1, 1, "Server Alpha", "RAM", "512 GiB"),
        (2, 0, "Server Beta", "OS", "linux"),
    }


def test_ragged_extra_dd_is_dropped(spark):
    # one dt, two dd: the flat positional model pairs dt0/dd0; dd1 has
    # a NULL key and drops
    html = "<h2>S</h2><dl><dt>k</dt><dd>v1</dd><dd>v2</dd></dl>"
    assert _rows(spark, html) == {(0, 0, "S", "k", "v1")}


def test_nested_dl_truncates(spark):
    html = "<h2>S</h2><dl><dt>a</dt><dd>1</dd><dl><dt>b</dt></dl><dt>c</dt><dd>2</dd></dl>"
    got = _rows(spark, html)
    assert (0, 0, "S", "a", "1") in got
    assert all(k != "c" for _, _, _, k, _ in got)


def test_claims_shape_lowercases_keys(spark):
    html = "<h2>Server Alpha</h2><dl><dt>CPU</dt><dd>64-core</dd></dl>"
    got = [
        (r["subject"], r["predicate"], r["object"])
        for r in dl_claims(_pages(spark, html)).collect()
    ]
    assert got == [("Server Alpha", "cpu", "64-core")]


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("u1", bytearray("<h2>S</h2><dl><dt>k</dt><dd>v</dd></dl>", "utf-8"))],
        "url string, html binary",
    )
    out = dl_facts(df).collect()
    assert {(r["subject"], r["key"], r["value"]) for r in out} == {("S", "k", "v")}


def test_plan_zero_udf_zero_shuffle(spark):
    df = dl_facts(_pages(spark, "<h2>S</h2><dl><dt>k</dt><dd>v</dd></dl>"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
