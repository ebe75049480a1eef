"""Portable-hash pages corpus: Spark <-> DuckDB reconstruction parity.

The triples_extract / pipeline_edges gate oracles derive the expected
triple relation in DuckDB from the row id alone; these tests pin the three
layers of that derivation: the hash, the sentence selection, and the
whole-page extraction semantics (dedup + step numbering).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sigraph_spark.corpus import (
    PORTABLE_M,
    gen_pages,
    page_sentence_idxs,
    page_sentence_idxs_sql,
    portable_hash,
    portable_hash_sql,
)


def _py_ph(i: int, salt: int) -> int:
    x = ((i % PORTABLE_M) * 1103515245 + (salt * 12345 + 12345)) % PORTABLE_M
    x = (x * 48271) % PORTABLE_M
    return (x * 48271) % PORTABLE_M


def test_portable_hash_cross_engine(spark):
    n = 1000
    for salt in (11, 12, 13, 14):
        got_spark = [
            r["h"]
            for r in spark.range(n)
            .select(portable_hash(F.col("id"), salt).alias("h"))
            .orderBy("id")
            .collect()
        ]
        got_duck = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {portable_hash_sql('range', salt)} AS h"
                f" FROM range(0, {n}) ORDER BY range"
            ).fetchall()
        ]
        got_py = [_py_ph(i, salt) for i in range(n)]
        assert got_spark == got_duck == got_py


def test_page_sentence_idxs_matches_sql(spark):
    n = 500
    spark_rows = {
        r["i"]: list(r["idxs"])
        for r in spark.range(n)
        .withColumnRenamed("id", "i")
        .select("i", page_sentence_idxs("i").alias("idxs"))
        .collect()
    }
    frag = page_sentence_idxs_sql("i", "j")
    duck = duckdb.sql(
        f"""
        WITH pg AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, {n}))
        SELECT i, list({frag['sent_idx']} ORDER BY j) AS idxs
        FROM pg, UNNEST(range(0, {frag['n_sent']})) AS t(j)
        GROUP BY i
        """
    ).fetchall()
    duck_rows = {i: list(idxs) for i, idxs in duck}
    assert spark_rows == duck_rows


def test_page_extraction_matches_relational_derivation():
    """extract_triples over an assembled page == the SQL-style derivation
    (select idxs -> join golden bank -> first-instance dedup -> renumber):
    the invariant the DuckDB gate oracles rely on."""
    from sigraph_spark.operators.triples import SENTENCE_BANK, extract_triples

    safe = [s for s in SENTENCE_BANK if s.page_safe]
    kb = len(safe)
    for i in range(1500):
        n_sent = _py_ph(i, 11) % 4 + 2
        stride = _py_ph(i, 13) % (kb - 1) + 1
        idxs = [(_py_ph(i, 12) + j * stride) % kb + 1 for j in range(n_sent)]
        text = "\n".join(safe[ix - 1].text for ix in idxs)
        got = [
            (t.step, t.actor, t.verb, t.object, t.context)
            for t in extract_triples(text)
        ]
        rows = []
        for j, ix in enumerate(idxs):
            for t_ord, (a, v, o) in enumerate(safe[ix - 1].expected):
                rows.append(
                    (j, t_ord, a, v, o, "in memory" if v == "inject" else None)
                )
        seen: set = set()
        exp = []
        for (j, t_ord, a, v, o, c) in sorted(rows, key=lambda r: (r[0], r[1])):
            if (a, v, o) in seen:
                continue
            seen.add((a, v, o))
            exp.append((len(exp) + 1, a, v, o, c))
        assert got == exp, f"page {i} diverged"


def test_oracle_constants_hold(spark):
    """Guards for the hard-oracle assumptions: the gate queries pin
    sf=0.01 == 10,000 pages, and the pipeline_edges oracle inlines NO
    entity mapping because linking over the full bank vocabulary produces
    the identity map — a future SENTENCE_BANK edit that introduces a
    near-dup merge must fail HERE with a clear message, not as an opaque
    driver hash mismatch."""
    from sigraph_spark.corpus import pages_count
    from sigraph_spark.operators.linking import link_entities
    from sigraph_spark.operators.triples import SENTENCE_BANK

    assert pages_count(0.01) == 10_000  # oracle range(0, 10000)

    rows = []
    for s in SENTENCE_BANK:
        if s.page_safe:
            for (a, v, o) in s.expected:
                rows.append(("u", a, v, o))
    triples = spark.createDataFrame(
        rows, "url string, actor string, verb string, object string"
    )
    nonid = [
        (r["entity"], r["canonical_id"])
        for r in link_entities(triples).collect()
        if r["entity"] != r["canonical_id"]
    ]
    assert nonid == [], (
        "bank vocabulary no longer maps to itself — update the "
        "pipeline_edges oracle SQL with these canonicalization pairs: "
        f"{nonid}"
    )


def test_gen_pages_embeds_selected_sentences(spark):
    """The html body embeds exactly the selected bank sentences in order."""
    from sigraph_spark.operators.triples import SENTENCE_BANK

    safe = [s.text for s in SENTENCE_BANK if s.page_safe]
    pages = {r["url"]: bytes(r["html"]).decode("utf-8")
             for r in gen_pages(spark, sf=0.001).limit(50).collect()}
    kb = len(safe)
    for url, html in pages.items():
        i = int(url.rsplit("/", 1)[1])
        n_sent = _py_ph(i, 11) % 4 + 2
        stride = _py_ph(i, 13) % (kb - 1) + 1
        idxs = [(_py_ph(i, 12) + j * stride) % kb + 1 for j in range(n_sent)]
        body = "\n".join(safe[ix - 1] for ix in idxs)
        assert body in html
