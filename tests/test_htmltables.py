from __future__ import annotations

from sigraph_spark.operators.htmltables import (
    extract_tables,
    table_cells,
    table_triples,
)


def _pages(spark, html):
    return spark.createDataFrame([("u1", html)], "url string, html string")


BASIC = """
<html><body><p>noise <b>text</b></p>
<table class="specs">
  <tr><th>host</th><th>cpu</th><th>os</th></tr>
  <tr><td><b>srv-1</b></td><td>8</td><td>linux</td></tr>
  <tr><td>srv-2</td><td>16</td><td>
      windows
  </td></tr>
</table>
<table><tr><td>k</td><td>v</td></tr></table>
</body></html>
"""


def test_basic_triples_and_cleaning(spark):
    out = {
        (r["table_idx"], r["subj"], r["predicate"], r["obj"])
        for r in table_triples(_pages(spark, BASIC)).collect()
    }
    # <b> stripped; multi-line cell collapsed; header-only table 1 emits 0
    assert out == {
        (0, "srv-1", "cpu", "8"),
        (0, "srv-1", "os", "linux"),
        (0, "srv-2", "cpu", "16"),
        (0, "srv-2", "os", "windows"),
    }


def test_ragged_rows_and_empty_cells(spark):
    html = (
        "<table><tr><th>name</th><th>a</th><th>b</th></tr>"
        "<tr><td>x</td><td>1</td></tr>"  # missing b -> only a
        "<tr><td>y</td><td></td><td>2</td></tr>"  # empty a -> only b
        "<tr><td>z</td><td>3</td><td>4</td><td>extra</td></tr>"  # extra ignored
        "<tr><td></td><td>5</td><td>6</td></tr>"  # empty subject -> none
        "</table>"
    )
    out = {
        (r["subj"], r["predicate"], r["obj"])
        for r in table_triples(_pages(spark, html)).collect()
    }
    assert out == {("x", "a", "1"), ("y", "b", "2"), ("z", "a", "3"), ("z", "b", "4")}


def test_th_td_mixed_and_multiple_tables(spark):
    html = (
        "<table><tr><td>key</td><td>value</td></tr>"
        "<tr><th>owner</th><td>team-4</td></tr></table>"
        "<p>between</p>"
        "<table><tr><th>id</th><th>v</th></tr><tr><td>7</td><td>8</td></tr></table>"
    )
    out = {
        (r["table_idx"], r["subj"], r["predicate"], r["obj"])
        for r in table_triples(_pages(spark, html)).collect()
    }
    assert out == {(0, "owner", "value", "team-4"), (1, "7", "v", "8")}


def test_table_cells_indices(spark):
    rows = table_cells(extract_tables(_pages(spark, BASIC))).collect()
    by_key = {(r["table_idx"], r["row_idx"]): r["cells"] for r in rows}
    assert by_key[(0, 0)] == ["host", "cpu", "os"]
    assert by_key[(0, 1)] == ["srv-1", "8", "linux"]
    assert by_key[(1, 0)] == ["k", "v"]


def test_binary_html_and_no_tables(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(BASIC, "utf-8")), ("u2", bytearray(b"<p>no tables</p>"))],
        "url string, html binary",
    )
    out = table_triples(df).collect()
    assert {r["url"] for r in out} == {"u1"}
    assert len(out) == 4


def test_no_python_udf_in_plan(spark):
    plan = (
        table_triples(_pages(spark, BASIC))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
