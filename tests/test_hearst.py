from __future__ import annotations

from sigraph_spark.operators.hearst import hearst_pairs, taxonomy_edges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )


def _pairs(spark, texts):
    return {
        (r["hypo"], r["hyper"], r["pattern"])
        for r in hearst_pairs(_docs(spark, texts)).collect()
    }


def test_such_as_with_coordinated_list(spark):
    got = _pairs(spark, ["Animals such as dogs, cats and big horses roam."])
    assert got == {
        ("dogs", "animals", "such_as"),
        ("cats", "animals", "such_as"),
        ("big horses", "animals", "such_as"),
    }


def test_and_other_or_other(spark):
    got = _pairs(
        spark,
        ["bronze, silver and other metals shine.", "trucks or other vehicles pass."],
    )
    assert ("bronze", "metals", "and_other") in got
    assert ("silver", "metals", "and_other") in got
    assert ("trucks", "vehicles", "or_other") in got


def test_including_especially_and_such_np_as(spark):
    got = _pairs(
        spark,
        [
            "countries, including france and spain, signed.",
            "fruit, especially apples, is good.",
            "such tools as hammers and saws were used.",
        ],
    )
    assert ("france", "countries", "including") in got
    assert ("spain", "countries", "including") in got
    assert ("apples", "fruit", "especially") in got
    assert ("hammers", "tools", "such_np_as") in got
    assert ("saws", "tools", "such_np_as") in got


def test_no_match_and_self_pair_dropped(spark):
    got = _pairs(
        spark,
        ["nothing to see here.", "things such as things are here."],
    )
    assert got == set()  # self pair (things, things) dropped


def test_taxonomy_edges_support_and_direction(spark):
    texts = (
        ["animals such as dogs are friendly."] * 3
        + ["dogs such as animals are odd."]  # reverse, weaker (1 < 3)
        + ["metals such as tin are shiny.", "tin and other metals melt."]
        + ["gems such as opals are rare."]  # support 1 -> dropped
    )
    out = {
        (r["hypo"], r["hyper"]): (r["n_mentions"], r["n_patterns"])
        for r in taxonomy_edges(hearst_pairs(_docs(spark, texts))).collect()
    }
    assert out[("dogs", "animals")] == (3, 1)
    assert ("animals", "dogs") not in out  # lost the direction vote
    assert out[("tin", "metals")] == (2, 2)  # two distinct patterns
    assert ("opals", "gems") not in out  # below min_support


def test_taxonomy_tie_breaks_lexicographically(spark):
    texts = ["aaa such as bbb are fine.", "bbb such as aaa are fine."]
    out = {(r["hypo"], r["hyper"]) for r in taxonomy_edges(
        hearst_pairs(_docs(spark, texts)), min_support=1
    ).collect()}
    assert out == {("aaa", "bbb")}


def test_no_python_udf(spark):
    df = taxonomy_edges(hearst_pairs(_docs(spark, ["animals such as dogs."])))
    assert "EvalPython" not in df._jdf.queryExecution().executedPlan().toString()
