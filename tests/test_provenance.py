"""Parser tests ported verbatim from the reference's only unit-test suite:
/root/reference/src/graph/provenance/tests/test_type_extension.py (17 cases).

The reference raises InvalidInputException; our set-oriented parsers return
an ``error`` field instead (SURVEY.md §5.1), so "raises" cases assert a
non-null error and null payload fields.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.functions.provenance import (
    parse_actor,
    parse_artifact,
    parse_parent_artifact,
)


def _parse_one(spark, value, parser):
    df = spark.createDataFrame([(value,)], "sp string")
    return df.select(parser(F.col("sp")).alias("p")).select("p.*").first()


# --- TestFromSystemProvenanceToArtifact -----------------------------------

def test_artifact_valid_data(spark):
    r = _parse_one(spark, "example_artifact@FILE", parse_artifact)
    assert r.error is None
    assert r.name == "example_artifact"
    assert r.artifact_type == "FILE"


def test_artifact_valid_data2_at_in_name(spark):
    r = _parse_one(spark, "example@artifact@name@FILE", parse_artifact)
    assert r.error is None
    assert r.name == "example@artifact@name"
    assert r.artifact_type == "FILE"


@pytest.mark.parametrize(
    "value",
    [
        "",                               # test_empty_data
        "invalid_format",                 # test_invalid_format (no '@')
        "invalid_format@WHOAMI",          # test_missing_tokens (unknown type)
        "example_artifact@",              # test_empty_tokens
        "example_artifact@INVALID_ARTIFACT",  # test_invalid_artifact_type
    ],
)
def test_artifact_errors(spark, value):
    r = _parse_one(spark, value, parse_artifact)
    assert r.error is not None
    assert r.name is None and r.artifact_type is None


# --- TestFromSystemProvenanceToActor ---------------------------------------

def test_actor_valid_data(spark):
    r = _parse_one(spark, "example_artifact@FILE@CREATE@WRITE_SEND", parse_actor)
    assert r.error is None
    assert r.artifact == "example_artifact@FILE"
    assert r.action == "CREATE"
    assert r.actor_type == "WRITE_SEND"


def test_actor_valid_data2_at_in_name(spark):
    r = _parse_one(spark, "example@artifact@name@FILE@CREATE@WRITE_SEND", parse_actor)
    assert r.error is None
    assert r.artifact == "example@artifact@name@FILE"
    assert r.action == "CREATE"
    assert r.actor_type == "WRITE_SEND"


@pytest.mark.parametrize(
    "value",
    [
        "",                                            # empty
        "invalid_format",                              # no '@'
        "invalid_format@WHOAMI@LAUGH",                 # <4 tokens
        "example_artifact@FILE@CREATE@",               # empty token
        "example_artifact@FILE@INVALID_ACTION@WRITE_SEND",     # bad action
        "example_artifact@INVALID_ARTIFACT@CREATE@WRITE_SEND", # bad artifact
        "example_artifact@FILE@CREATE@INVALID_ACTOR",          # bad actor
    ],
)
def test_actor_errors(spark, value):
    r = _parse_one(spark, value, parse_actor)
    assert r.error is not None
    assert r.artifact is None and r.action is None and r.actor_type is None


# --- Parent derivation quirk (type_extension.py:185-208) --------------------

def test_parent_first_two_tokens(spark):
    r = _parse_one(spark, "parent_proc@PROCESS@LAUNCH@NOT_ACTOR", parse_parent_artifact)
    assert r.error is None
    assert r.artifact == "parent_proc@PROCESS"


def test_parent_truncation_quirk(spark):
    # A parent whose *name* contains '@' is truncated to the first two tokens
    # (reference asymmetry, type_extension.py:206-207) — 'a@b' then parses as
    # name 'a', type 'b'; 'b' is not a valid ArtifactType, so this errors.
    r = _parse_one(spark, "my@proc@PROCESS@LAUNCH@NOT_ACTOR", parse_parent_artifact)
    assert r.error is not None


def test_parent_plain(spark):
    r = _parse_one(spark, "loader.exe@PROCESS", parse_parent_artifact)
    assert r.error is None
    assert r.name == "loader.exe"
    assert r.artifact_type == "PROCESS"
