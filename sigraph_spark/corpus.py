"""Deterministic synthetic corpora (FIXTURES.md).

Two generators, both pure functions of (sf, seed) — no wall clock, no
global RNG state — so every run, partition count, and parallelism level
produces byte-identical inputs:

* ``gen_events``   — sigraph-native provenance events (FIXTURES.md §2),
  exercising @-in-name artifacts, all three directions, null parents,
  repeated (node, trace) pairs, duplicate triples with differing
  timestamps, one skewed head entity (>=30% of rows), and invalid rows for
  the error channel.
* ``gen_pages``    — Common-Crawl-style pages per BASELINE.json
  ``input_hint`` (url, warc_ts, html, text, lang): seeded templates
  embedding known behavior sentences from the golden sentence bank
  (operators/triples.py fixtures) wrapped in boilerplate so the stripper
  has real work.

Rows are generated distributively: we parallelize an id range and derive
every field arithmetically from the id (hash-seeded), so generation itself
scales — no driver-side list materialization at large sf.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = dt.datetime(2024, 1, 1)

ACTIONS_BY_TYPE = {
    "FILE": ["CREATE", "RENAME", "DELETE", "MODIFY", "RAW_ACCESS_READ"],
    "REGISTRY": ["REG_ADD", "REG_DELETE", "REG_SET", "REG_QUERY"],
    "NETWORK": ["CONNECT", "ACCEPT"],
    "PROCESS": ["LAUNCH", "ACCESS", "REMOTE_THREAD", "TAMPERING"],
    "MODULE": ["LOAD"],
}
ACTORS = ["READ_RECV", "WRITE_SEND", "NOT_ACTOR"]


def events_count(sf: float) -> int:
    return max(200, int(500_000 * sf / 0.1))


def pages_count(sf: float) -> int:
    return max(64, int(100_000 * sf / 0.1))


# ---------------------------------------------------------------------------
# Engine-portable row hash (pages corpus only)
# ---------------------------------------------------------------------------
# The pages generator must be reconstructable by the DuckDB oracle so the
# triple-extraction gate queries can be HARD-oracled (expected triples per
# url are a pure function of the row id). xxhash64 is Spark-specific, so
# page-level randomness uses two Lehmer (minstd, a=48271 mod 2^31-1) rounds
# over a salted linear seed — exact int64 arithmetic in BOTH engines (ANSI
# overflow-safe: every product < 2^63). gen_events keeps xxhash64 (its
# oracles read the same parquet, nothing re-derives it cross-engine).

PORTABLE_M = 2147483647  # 2^31 - 1


def portable_hash(i_col, salt: int):
    """Column form: deterministic hash of (row id, salt) in [0, 2^31-1)."""
    x = ((i_col % PORTABLE_M) * 1103515245 + (salt * 12345 + 12345)) % PORTABLE_M
    x = (x * 48271) % PORTABLE_M
    return (x * 48271) % PORTABLE_M


def portable_hash_sql(expr: str, salt: int) -> str:
    """The same function as DuckDB SQL text (kept adjacent for parity)."""
    c = salt * 12345 + 12345
    x0 = f"(((({expr}) % {PORTABLE_M}) * 1103515245 + {c}) % {PORTABLE_M})"
    x1 = f"(({x0} * 48271) % {PORTABLE_M})"
    return f"(({x1} * 48271) % {PORTABLE_M})"


def gen_events(spark: SparkSession, sf: float = 0.001, parts: int | None = None) -> DataFrame:
    """Provenance events table (GraphNode schema, graph_model.py:29-41)."""
    n = events_count(sf)
    # scale-adaptive floor, same rationale as gen_pages
    parts = parts or max(
        4, n // 50_000, spark.sparkContext.defaultParallelism
    )
    base = spark.range(0, n, 1, parts).withColumnRenamed("id", "i")

    # deterministic pseudo-random streams from the row id (xxhash64 is a
    # fixed, documented function — identical across runs and partitionings)
    def h(salt: int):
        return F.abs(F.xxhash64(F.col("i"), F.lit(salt)))

    n_units = max(4, n // 2000)
    n_traces_per_unit = 25
    unit = (h(1) % n_units).alias("unit_n")
    trace = (h(2) % n_traces_per_unit).alias("trace_n")

    atype_idx = h(3) % 100
    # artifact type mix: FILE 35, REGISTRY 20, NETWORK 15, PROCESS 20, MODULE 10
    atype = (
        F.when(atype_idx < 35, "FILE")
        .when(atype_idx < 55, "REGISTRY")
        .when(atype_idx < 70, "NETWORK")
        .when(atype_idx < 90, "PROCESS")
        .otherwise("MODULE")
    )
    df = base.select(
        "i", unit, trace, atype.alias("atype"),
        h(4).alias("h4"), h(5).alias("h5"), h(6).alias("h6"),
        h(7).alias("h7"), h(8).alias("h8"), h(9).alias("h9"),
    )

    # head-entity skew: ~32% of rows hit one hot FILE artifact
    is_hot = (F.col("h4") % 100) < 32
    # limited artifact vocabulary per type => repeated (node, trace) pairs
    name = F.when(is_hot, F.lit("C:\\\\windows\\\\temp\\\\hot@payload.bin")).otherwise(
        F.concat(
            F.lower(F.col("atype")), F.lit("_art_"), (F.col("h5") % (20 + n // 100)).cast("string")
        )
    )
    artifact_type = F.when(is_hot, F.lit("FILE")).otherwise(F.col("atype"))

    # action drawn from the type's action list
    action = F.lit(None).cast("string")
    for t, acts in ACTIONS_BY_TYPE.items():
        pick = F.element_at(
            F.array(*[F.lit(a) for a in acts]), (F.col("h6") % len(acts) + 1).cast("int")
        )
        action = F.when(artifact_type == t, pick).otherwise(action)
    actor = F.element_at(
        F.array(*[F.lit(a) for a in ACTORS]), (F.col("h7") % 3 + 1).cast("int")
    )

    parent_n = F.col("h8") % 12
    has_parent = (F.col("h9") % 10) < 8  # 20% null parents
    parent_name = F.concat(F.lit("proc_"), parent_n.cast("string"), F.lit(".exe"))
    parent_sp = F.when(
        has_parent,
        F.concat(parent_name, F.lit("@PROCESS@LAUNCH@NOT_ACTOR")),
    )

    # ~1.5% invalid rows for the error channel (FIXTURES.md §2)
    bad_kind = F.col("h4") % 1000
    sp_good = F.concat_ws(
        "@", name, artifact_type, action, actor
    )
    sp = (
        F.when(bad_kind == 0, F.lit(""))
        .when(bad_kind == 1, F.lit("no_at_separator"))
        .when(bad_kind == 2, F.concat(name, F.lit("@BADTYPE@CREATE@WRITE_SEND")))
        .when(bad_kind == 3, F.concat(name, F.lit("@FILE@BADACTION@WRITE_SEND")))
        .otherwise(sp_good)
    )

    ts = F.to_timestamp(F.lit(EPOCH.isoformat())) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), (F.col("h5") % 86_400_0).cast("double") / 10.0
    )

    rule_ids = F.when(
        (F.col("h6") % 20) == 0,
        F.array(
            F.concat(F.lit("rule-"), (F.col("h7") % 8).cast("string")),
            F.concat(F.lit("rule-"), (F.col("h8") % 8).cast("string")),
        ),
    )

    return df.select(
        F.concat(F.lit("trace-"), F.col("unit_n"), F.lit("-"), F.col("trace_n")).alias("trace_id"),
        F.concat(F.lit("span-"), F.col("i")).alias("span_id"),
        F.concat(F.lit("00000000-0000-4000-8000-"), F.lpad(F.col("unit_n").cast("string"), 12, "0")).alias("unit_id"),
        sp.alias("system_provenance"),
        ts.alias("timestamp"),
        (F.col("h9") % 9 + 1).cast("int").alias("weight"),
        F.when(has_parent, parent_name).alias("process_name"),
        rule_ids.alias("related_rule_ids"),
        F.when(has_parent, F.concat(F.lit("span-p-"), parent_n.cast("string"))).alias("parent_span_id"),
        parent_sp.alias("parent_system_provenance"),
    )


# ---------------------------------------------------------------------------
# Pages corpus (Common-Crawl-style) — built on the golden sentence bank
# ---------------------------------------------------------------------------

def page_sentence_idxs(i_col: str = "i"):
    """1-based indexes into the page-safe sentence bank for page ``i`` —
    the SAME expression gen_pages embeds, exposed so expected-triple
    derivation (tools/score_pr.py AND the DuckDB gate oracle) can
    reconstruct ground truth relationally. Pure function of the row id
    via ``portable_hash`` — see ``page_sentence_idxs_sql`` for the
    engine-portable SQL rendering."""
    from sigraph_spark.operators.triples import SENTENCE_BANK

    def h(salt: int):
        return portable_hash(F.col(i_col), salt)

    k_bank = len([s for s in SENTENCE_BANK if s.page_safe])
    n_sent = (h(11) % 4 + 2).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_sent - 1),
        lambda j: (h(12) + j * (h(13) % (k_bank - 1) + 1)) % k_bank + 1,
    )


def page_sentence_idxs_sql(i_expr: str = "i", j_expr: str = "j") -> dict[str, str]:
    """DuckDB SQL fragments mirroring ``page_sentence_idxs``: ``n_sent``
    (sentence count per page) and ``sent_idx`` (1-based bank index for
    sentence position ``j`` in 0..n_sent-1)."""
    from sigraph_spark.operators.triples import SENTENCE_BANK

    k_bank = len([s for s in SENTENCE_BANK if s.page_safe])
    h11 = portable_hash_sql(i_expr, 11)
    h12 = portable_hash_sql(i_expr, 12)
    h13 = portable_hash_sql(i_expr, 13)
    return {
        "n_sent": f"({h11} % 4 + 2)",
        "sent_idx": f"(({h12} + ({j_expr}) * ({h13} % {k_bank - 1} + 1)) % {k_bank} + 1)",
    }


def gen_pages(spark: SparkSession, sf: float = 0.001, parts: int | None = None) -> DataFrame:
    """Pages table (url, warc_ts, html, text, lang) per BASELINE.json input_hint.

    Each page embeds 2-5 behavior sentences drawn deterministically from the
    golden sentence bank (sigraph_spark.operators.triples.SENTENCE_BANK) in a
    boilerplate HTML template (nav/script/style/footer), so expected triples
    per url are derivable arithmetically — the goldens ARE the generator.
    """
    from sigraph_spark.operators.triples import SENTENCE_BANK

    n = pages_count(sf)
    # scale-adaptive parallelism (guide §2): sizing partitions at a flat
    # 20k pages gave FIVE partitions at sf0.1, so every downstream
    # narrow pass (html strip, triple matching) ran on 5 of the
    # cluster's cores — the local-mode starvation bench.py documents
    # for the webtext fixtures. Floor at the session's default
    # parallelism; rows are a pure function of ``i`` so the partition
    # count never changes the data.
    parts = parts or max(
        4, n // 20_000, spark.sparkContext.defaultParallelism
    )
    base = spark.range(0, n, 1, parts).withColumnRenamed("id", "i")

    def h(salt: int):
        return portable_hash(F.col("i"), salt)

    safe_bank = [s for s in SENTENCE_BANK if s.page_safe]
    bank = F.array(*[F.lit(s.text) for s in safe_bank])
    idxs = page_sentence_idxs("i")
    body_sentences = F.transform(idxs, lambda ix: F.element_at(bank, ix.cast("int")))
    body = F.concat_ws("\n", body_sentences)

    title = F.concat(F.lit("Threat report #"), F.col("i").cast("string"))
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title><script>var x=1;</script>"
              "<style>.a{color:red}</style></head><body>"
              "<nav><a href='/'>Home</a> | <a href='/about'>About</a></nav>"
              "<div class='content'><h1>"), title,
        F.lit("</h1><p>"), body,
        F.lit("</p></div><footer>&copy; 2024 Example Corp &mdash; all rights reserved</footer>"
              "</body></html>"),
    )
    ts = F.to_timestamp(F.lit(EPOCH.isoformat())) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), (h(14) % 31_536_000).cast("double")
    )
    return base.select(
        F.concat(F.lit("https://example.org/report/"), F.col("i").cast("string")).alias("url"),
        ts.alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )


def gen_pages_zipf(
    spark: SparkSession,
    sf: float = 0.001,
    hot_frac: float = 0.3,
    parts: int | None = None,
    obj_pool: int | None = 997,
) -> DataFrame:
    """Zipfian head-entity variant of :func:`gen_pages`: ~``hot_frac`` of
    pages additionally mention ONE fixed hot entity (the north-star
    "high-degree URL/entity in ~30% of pages" case).

    ``obj_pool`` bounds the hot entity's object vocabulary (default a
    ~1000-member pool): the soak then isolates FREQUENCY skew — one
    subject carrying 30% of all triple instances — from vocabulary
    explosion. Pass ``obj_pool=None`` for a per-page-unique object, which
    additionally stresses LSH blocking with a giant templated entity
    family (the case that motivated candidate_pairs' hot-bucket guard).

    Built by injecting an extra behavior sentence into the base page HTML
    (a literal string replace on the single ``</p>`` closing the content
    div), so everything stays deterministic and the uniform/zipf corpora
    differ ONLY in the head entity — stage-time ratios between the two
    isolate the cost of skew."""
    base = gen_pages(spark, sf, parts)
    i = F.substring_index(F.col("url"), "/", -1).cast("long")
    is_hot = (portable_hash(i, 97) % 1000) < int(hot_frac * 1000)
    obj_i = i if obj_pool is None else i % obj_pool
    hot_sentence = F.concat(
        F.lit("HotBot executed C:\\hot\\payload_"),
        obj_i.cast("string"),
        F.lit(".exe."),
    )
    html_s = F.decode(F.col("html"), "UTF-8")
    injected = F.replace(
        html_s,
        F.lit("</p>"),
        F.concat(F.lit("\n"), hot_sentence, F.lit("</p>")),
    )
    return base.select(
        "url", "warc_ts",
        F.encode(
            F.when(is_hot, injected).otherwise(html_s), "UTF-8"
        ).alias("html"),
        "text", "lang",
    )
