"""Sigma-subset compiler: detection trees -> Column predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.sigma import apply_rules, compile_rule


def _docs(spark):
    rows = [
        (1, "powershell.exe", "cmd.exe", 4688),
        (2, "winword.exe", "powershell.exe", 4688),
        (3, "svchost.exe", "services.exe", 7045),
        (4, "mimikatz.exe", "cmd.exe", 4688),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, Image string, ParentImage string, EventID int"
    )


def test_exact_and_list(spark):
    rule = {"detection": {"sel": {"Image": ["powershell.exe", "mimikatz.exe"]},
                          "condition": "sel"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {1, 4}


def test_modifiers_and_wildcards(spark):
    rule = {"detection": {
        "a": {"Image|endswith": ".exe", "ParentImage|contains": "cmd"},
        "b": {"Image": "win*"},
        "condition": "a or b"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {1, 2, 4}


def test_condition_grammar(spark):
    rule = {"detection": {
        "sel1": {"EventID": 4688},
        "sel2": {"Image|startswith": "power"},
        "condition": "sel1 and not sel2"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {2, 4}


def test_one_of_them(spark):
    rule = {"detection": {
        "sel_a": {"Image": "svchost.exe"},
        "sel_b": {"EventID": 7045},
        "condition": "all of them"}}
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {3}
    rule["detection"]["condition"] = "1 of sel*"
    got = {r["doc_id"] for r in _docs(spark).filter(compile_rule(rule)).collect()}
    assert got == {3}


def test_apply_rules_one_pass(spark):
    rules = [
        {"id": "r-power", "detection": {"s": {"Image|startswith": "power"}, "condition": "s"}},
        {"id": "r-4688", "detection": {"s": {"EventID": 4688}, "condition": "s"}},
    ]
    out = {(r["doc_id"], r["rule_id"]) for r in apply_rules(_docs(spark), rules).collect()}
    assert out == {(1, "r-power"), (1, "r-4688"), (2, "r-4688"), (4, "r-4688")}


def test_unknown_selection_raises(spark):
    rule = {"detection": {"sel": {"Image": "x"}, "condition": "nope"}}
    with pytest.raises(ValueError):
        compile_rule(rule)
