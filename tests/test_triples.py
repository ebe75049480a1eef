"""S2 triple extraction: golden-triple sets (FIXTURES.md §3) per rule group,
chunk-boundary invariance, and the Spark UDF surface."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.triples import (
    SENTENCE_BANK,
    VERB_WHITELIST,
    chunk_text,
    extract_triples,
    triples_from_docs,
)

GROUPS = sorted({s.group for s in SENTENCE_BANK})


@pytest.mark.parametrize("group", GROUPS)
def test_golden_group(group):
    for s in (x for x in SENTENCE_BANK if x.group == group):
        got = tuple((t.actor, t.verb, t.object) for t in extract_triples(s.text))
        assert got == s.expected, f"{s.text!r}: {got} != {s.expected}"


def test_verbs_always_whitelisted():
    doc = "\n".join(s.text for s in SENTENCE_BANK)
    for t in extract_triples(doc):
        assert t.verb in VERB_WHITELIST


def test_steps_are_sequential():
    doc = "\n".join(s.text for s in SENTENCE_BANK if s.page_safe)
    steps = [t.step for t in extract_triples(doc)]
    assert steps == list(range(1, len(steps) + 1))


def test_chunk_invariance_randomized():
    safe = [s for s in SENTENCE_BANK if s.page_safe]
    rng = random.Random(1234)
    for _ in range(100):
        entries = [safe[rng.randrange(len(safe))] for _ in range(rng.randint(2, 8))]
        doc = "\n".join(e.text for e in entries)
        want = set()
        for e in entries:
            want.update(e.expected)
        whole = {(t.actor, t.verb, t.object) for t in extract_triples(doc)}
        chunked = set()
        for c in chunk_text(doc):
            chunked.update((t.actor, t.verb, t.object) for t in extract_triples(c))
        assert whole == want
        assert chunked == want


def test_download_split_always_two_lines():
    trips = extract_triples(
        "APT29 downloaded http://staging.evil.example/p.bin to C:\\Users\\Public\\p.bin."
    )
    assert [t.verb for t in trips] == ["http_request", "create"]
    # literals preserved byte-verbatim (I6)
    assert trips[0].object == "http://staging.evil.example/p.bin"
    assert trips[1].object == "C:\\Users\\Public\\p.bin"


def test_spark_udf_matches_local(spark):
    docs = spark.createDataFrame(
        [(s.text, f"u{i}") for i, s in enumerate(SENTENCE_BANK)], "text string, url string"
    )
    got = {
        (r.url, r.actor, r.verb, r.object)
        for r in triples_from_docs(docs).collect()
    }
    want = set()
    for i, s in enumerate(SENTENCE_BANK):
        for (a, v, o) in s.expected:
            want.add((f"u{i}", a, v, o))
    assert got == want


def test_udf_is_arrow_batched(spark):
    docs = spark.createDataFrame([("x", "u")], "text string, url string")
    plan = triples_from_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
