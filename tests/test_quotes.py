"""Quotation/attribution extraction (operators/quotes.py).

Pins the three attribution shapes (pre / post / according-to), the 1-3
capitalized-token speaker heuristic, the verb inventory gate, trailing
in-quote punctuation stripping, document-order quote_idx across shapes,
and the zero-UDF / zero-shuffle plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.quotes import extract_quotes


def _docs(spark, text: str, url: str = "u1"):
    return spark.createDataFrame([(url, text)], "url string, text string")


def _rows(spark, text: str):
    return {
        (r["quote_idx"], r["speaker"], r["verb"], r["quote"])
        for r in extract_quotes(_docs(spark, text)).collect()
    }


def test_three_shapes_in_document_order(spark):
    text = (
        'Alice Carter said "the segment is stable." '
        '"We moved the rack," said Bob Stone. '
        'According to Eve Long, "the quota is five."'
    )
    assert _rows(spark, text) == {
        (0, "Alice Carter", "said", "the segment is stable"),
        (1, "Bob Stone", "said", "We moved the rack"),
        (2, "Eve Long", "according_to", "the quota is five"),
    }


def test_verb_inventory_gates_matches(spark):
    text = 'The log shows "error 42" today. Carol noted: "disk is full."'
    assert _rows(spark, text) == {(0, "Carol", "noted", "disk is full")}


def test_speaker_up_to_three_tokens(spark):
    text = 'Jean Paul Smith warned "backups are stale."'
    assert _rows(spark, text) == {
        (0, "Jean Paul Smith", "warned", "backups are stale")
    }


def test_trailing_punctuation_stripped_inside_quotes(spark):
    text = '"Check unit nine!" said Max. Ada wrote "done..."'
    assert _rows(spark, text) == {
        (0, "Max", "said", "Check unit nine"),
        (1, "Ada", "wrote", "done"),
    }


def test_unattributed_quote_emits_nothing(spark):
    assert _rows(spark, 'It was "fine" overall.') == set()


def test_plan_zero_udf_zero_shuffle(spark):
    df = extract_quotes(_docs(spark, 'Bo said "x"'))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
