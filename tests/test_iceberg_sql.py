"""Iceberg production SQL goldens: every statement parses under Spark's
SQL parser (no catalog needed) and the MERGE combiners pin the §1.3
re-upsert semantics textually."""

from __future__ import annotations

import pytest

from sigraph_spark.plans.iceberg_sql import DDL, FLUSH_UNIT, MERGE, all_statements


def test_all_statements_parse(spark):
    parser = spark._jsparkSession.sessionState().sqlParser()
    for sql in all_statements():
        # named parameters (:unit_id) parse via substitution
        parser.parsePlan(sql.replace(":unit_id", "'u'"))  # raises on syntax error


def test_ddl_partitioning_pins_flush_and_colocation():
    assert "PARTITIONED BY (bucket(16, unit_id))" in DDL["traces"]
    assert "PARTITIONED BY (bucket(16, unit_id))" in DDL["trace_contains"]
    assert "PARTITIONED BY (bucket(16, unit_id))" in DDL["trace_spans"]
    assert "PARTITIONED BY (bucket(16, node_id))" in DDL["nodes"]
    assert "PARTITIONED BY (bucket(16, src))" in DDL["edges"]
    for sql in DDL.values():
        assert "USING iceberg" in sql


def test_merge_semantics_pinned():
    # nodes: list set-union + keep-existing-unless-null image
    assert "array_sort(array_union(t.related_span_ids, s.related_span_ids))" in MERGE["nodes"]
    assert "s.image IS NOT NULL AND (t.image IS NULL OR" in MERGE["nodes"]
    # edges: last-writer-wins guarded update
    assert (
        "WHEN MATCHED AND struct(s.start_time, s.last_span_id) > "
        "struct(t.start_time, t.last_span_id)" in MERGE["edges"]
    )
    # traces: NO span array on the row — span_count re-derived from the
    # already-merged trace_spans membership table (idempotent under replay
    # with bounded per-row state)
    assert "span_ids" not in DDL["traces"] and "span_ids" not in MERGE["traces"]
    assert "FROM sigraph.trace_spans GROUP BY unit_id, trace_id" in MERGE["traces"]
    assert "t.span_count = s.span_count" in MERGE["traces"]
    # the membership merge must run BEFORE the traces merge
    ks = list(MERGE)
    assert ks.index("trace_spans") < ks.index("traces")
    # containment / spans / matches: insert-if-absent only
    for k in ("trace_contains", "trace_spans", "rule_matches"):
        assert "WHEN MATCHED" not in MERGE[k]
        assert "WHEN NOT MATCHED THEN INSERT *" in MERGE[k]


def test_flush_unit_is_partition_local():
    for sql in FLUSH_UNIT.values():
        assert "WHERE unit_id = :unit_id" in sql


def test_merge_combiners_match_batch_merge(spark):
    """Execute the MERGE combiner EXPRESSIONS (the portable part) against a
    two-sided fixture and compare with operators.graph.merge_nodes — the
    text goldens and the batch path must encode the same function."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sigraph_spark.operators.graph import merge_nodes

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "node_id string, label string, image string, "
        "related_span_ids array<string>, related_trace_ids array<string>, "
        "image_ts timestamp, image_span string"
    )
    t = spark.createDataFrame(
        [("n1", "FILE", "a.exe", ["s1"], ["t1"], ts, "s1"),
         ("n2", "FILE", None, ["s2"], ["t2"], None, None)], schema
    )
    s = spark.createDataFrame(
        [("n1", "FILE", "b.exe", ["s3"], ["t1"], ts - dt.timedelta(seconds=1), "s0"),
         ("n2", "FILE", "c.exe", ["s4"], ["t3"], ts, "s4"),
         ("n3", "FILE", None, ["s5"], ["t5"], None, None)], schema
    )
    got = {r["node_id"]: r for r in merge_nodes(t, s).collect()}
    # earlier image_ts on the delta side wins n1; null-image existing n2
    # takes the delta's image; n3 inserts as-is
    assert got["n1"].image == "b.exe"
    assert got["n1"].related_span_ids == ["s1", "s3"]
    assert got["n2"].image == "c.exe"
    assert got["n3"].image is None


def test_minhash_index_binding_pinned():
    """The incremental-dedup index table buckets on the band key (both
    sides of the probe join storage-partitioned) and its merge is
    insert-if-absent (snapshot replay can't duplicate index rows)."""
    assert "PARTITIONED BY (bucket(256, bk))" in DDL["minhash_index"]
    assert "WHEN NOT MATCHED THEN INSERT *" in MERGE["minhash_index"]
    assert "WHEN MATCHED" not in MERGE["minhash_index"]


def test_linking_state_bindings_pinned():
    """Incremental-linking state tables: mapping is frozen history
    (insert-if-absent), the band index buckets on bk (probe join storage-
    partitioned), shingle_df merges by summation."""
    assert "WHEN NOT MATCHED THEN INSERT *" in MERGE["entity_mapping"]
    assert "WHEN MATCHED" not in MERGE["entity_mapping"]
    assert "PARTITIONED BY (bucket(256, bk))" in DDL["entity_band_index"]
    assert "t._df = t._df + s._df" in MERGE["entity_shingle_df"]


def test_fusion_state_bindings_pinned():
    """KG-fusion state: the claim set is a set-union semilattice ->
    insert-if-absent on the FULL claim tuple (replay = no-op at the
    MERGE level too); the fused table upserts recomputed winners on the
    fact key."""
    assert "WHEN NOT MATCHED THEN INSERT *" in MERGE["kg_claims"]
    assert "WHEN MATCHED" not in MERGE["kg_claims"]
    assert "t.source = s.source" in MERGE["kg_claims"]
    assert "PARTITIONED BY (bucket(64, subject))" in DDL["kg_claims"]
    assert "t.fused_object = s.fused_object" in MERGE["kg_fused"]
    assert "ON t.subject = s.subject AND t.predicate = s.predicate" in MERGE["kg_fused"]
