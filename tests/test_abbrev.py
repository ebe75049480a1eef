"""Abbreviation pair extraction (operators/abbrev.py).

Pins the strict-initialism model: connector words contribute no
initial, mismatching candidates drop but consume pair_idx, hyphenated
words contribute one initial, length bounds, duplicate retention, and
the zero-UDF / zero-shuffle plan invariant.
"""

from __future__ import annotations

from sigraph_spark.operators.abbrev import abbrev_pairs


def _docs(spark, text: str, url: str = "u1"):
    return spark.createDataFrame([(url, text)], "url string, text string")


def _rows(spark, text: str):
    return {
        (r["pair_idx"], r["long"], r["short"])
        for r in abbrev_pairs(_docs(spark, text)).collect()
    }


def test_basic_connectors_and_left_trim(spark):
    # the sentence-leading "The" is captured by the candidate regex but
    # left-trims away; the connector 'of' supplies DOD's O
    text = (
        "The Advanced Persistent Threat (APT) hit the "
        "Department of Defense (DOD) network."
    )
    assert _rows(spark, text) == {
        (0, "Advanced Persistent Threat", "APT"),
        (1, "Department of Defense", "DOD"),
    }


def test_mismatch_drops_but_consumes_index(spark):
    text = (
        "A Wrong Name (XYZ) candidate, then Central Processing Unit (CPU)."
    )
    assert _rows(spark, text) == {(1, "Central Processing Unit", "CPU")}


def test_hyphenated_word_one_initial(spark):
    assert _rows(spark, "The Intrusion-Detection System (IS) ran.") == {
        (0, "Intrusion-Detection System", "IS")
    }


def test_lowercase_long_word_breaks_candidate(spark):
    # 'persistent' is lowercase: the candidate regex can only capture
    # 'Advanced' + connectors, so no 3-letter candidate forms
    assert _rows(spark, "Advanced persistent Threat (APT) here.") == set()


def test_single_word_long_form_rejected(spark):
    assert _rows(spark, "Threat (T) or Threat (TH) never match.") == set()


def test_duplicates_kept_per_occurrence(spark):
    text = "Central Processing Unit (CPU) and Central Processing Unit (CPU)."
    assert _rows(spark, text) == {
        (0, "Central Processing Unit", "CPU"),
        (1, "Central Processing Unit", "CPU"),
    }


def test_plan_zero_udf_zero_shuffle(spark):
    df = abbrev_pairs(_docs(spark, "Big Data (BD)"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_alias_map_votes_and_ties(spark):
    from sigraph_spark.operators.abbrev import alias_map

    pairs = spark.createDataFrame(
        [("u1", 0, "Central Processing Unit", "CPU"),
         ("u2", 0, "Central Processing Unit", "CPU"),
         ("u3", 0, "Custom Pipeline Unit", "CPU"),
         ("u1", 1, "Only Once", "OO")],
        "url string, pair_idx int, long string, short string",
    )
    got = {(r["short"], r["long"], r["n_pages"])
           for r in alias_map(pairs).collect()}
    # CPU: 2-page reading wins; OO: single page cut by min_pages
    assert got == {("CPU", "Central Processing Unit", 2)}


def test_apply_aliases_broadcast_replace(spark):
    from sigraph_spark.operators.abbrev import alias_map, apply_aliases

    pairs = spark.createDataFrame(
        [("u1", 0, "Central Processing Unit", "CPU"),
         ("u2", 0, "Central Processing Unit", "CPU")],
        "url string, pair_idx int, long string, short string",
    )
    claims = spark.createDataFrame(
        [("CPU", "cores", "64"), ("GPU", "cores", "8192")],
        "subject string, predicate string, object string",
    )
    out = apply_aliases(claims, alias_map(pairs))
    got = {(r["subject"], r["object"]) for r in out.collect()}
    assert got == {("Central Processing Unit", "64"), ("GPU", "8192")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
