"""Triple P/R scoring against the golden sentence bank (BASELINE.json metric:
triple P/R >= 0.95 vs golden set at SF=0.1).

Ground truth is derivable relationally because the corpus generator embeds
exactly the page-safe golden sentences (corpus.page_sentence_idxs is the
shared selection expression): expected triples per url = the union of the
selected sentences' pinned triples, deduped on (actor, verb, object) —
matching the extractor's per-document IoC dedup (triples.py I6).

Everything is DataFrame ops — the score of a 10^8-page corpus is one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def golden_lookup(spark: SparkSession) -> DataFrame:
    """(sent_idx 1-based among page_safe bank entries, actor, verb, object)."""
    from sigraph_spark.operators.triples import SENTENCE_BANK

    rows = []
    idx = 0
    for s in SENTENCE_BANK:
        if not s.page_safe:
            continue
        idx += 1
        for (a, v, o) in s.expected:
            rows.append((idx, a, v, o))
    return spark.createDataFrame(
        rows, "sent_idx int, actor string, verb string, object string"
    )


def expected_triples(spark: SparkSession, sf: float) -> DataFrame:
    """Ground-truth (url, actor, verb, object) for the sf corpus."""
    from sigraph_spark.corpus import page_sentence_idxs, pages_count

    n = pages_count(sf)
    base = spark.range(0, n, 1, max(4, n // 20_000)).withColumnRenamed("id", "i")
    per_page = base.select(
        F.concat(F.lit("https://example.org/report/"), F.col("i").cast("string")).alias("url"),
        F.explode(F.array_distinct(page_sentence_idxs("i"))).alias("_si"),
    ).select("url", F.col("_si").cast("int").alias("sent_idx"))
    return (
        per_page.join(F.broadcast(golden_lookup(spark)), "sent_idx")
        .select("url", "actor", "verb", "object")
        .distinct()
    )


def score_pr(extracted: DataFrame, expected: DataFrame) -> dict:
    """Precision/recall of extracted (url, actor, verb, object) vs expected.

    One pass: full outer join on the quad key, count hit/miss/spurious.
    """
    e = extracted.select("url", "actor", "verb", "object").distinct().withColumn("_x", F.lit(1))
    g = expected.select("url", "actor", "verb", "object").distinct().withColumn("_g", F.lit(1))
    joined = e.join(g, ["url", "actor", "verb", "object"], "full_outer")
    row = joined.agg(
        F.sum(F.when(F.col("_x").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_x").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_x").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": round(precision, 5),
        "recall": round(recall, 5),
    }


def score_corpus(spark: SparkSession, sf: float) -> dict:
    """End-to-end: gen pages -> extract text -> extract triples -> score."""
    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.operators.extract import extract_pages
    from sigraph_spark.operators.triples import triples_from_docs

    pages = gen_pages(spark, sf=sf)
    docs = extract_pages(pages).select("url", "text")
    extracted = triples_from_docs(docs)
    return score_pr(extracted, expected_triples(spark, sf))
