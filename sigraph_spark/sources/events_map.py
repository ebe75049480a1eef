"""Deterministic mapping: driver testdata ``events`` -> sigraph GraphNode events.

The driver's correctness gate (CORRECTNESS_r{N}.json) runs each Spark query
against a DuckDB oracle over the same parquet. The testdata ``events`` table
is a generic stream (event_id, ts, user_id, event_type, value, props) —
TESTDATA.md — so we define ONE deterministic, SQL-expressible mapping into
the reference's GraphNode shape (``/root/reference/src/graph/graph_model.py:
29-41``) and keep the Spark and DuckDB renderings side by side; every
graph-construction oracle builds on the same CTE.

Mapping invariants (mirrors FIXTURES.md §2):
* artifact names contain ``@`` (``a@<n>``) — exercises the rightmost-binding
  parse quirk (type_extension.py:167-169);
* every third event per direction (READ_RECV / WRITE_SEND / NOT_ACTOR);
* 20% of events have no parent -> node+containment only, no action edge;
* ~1% invalid provenance (no ``@``) -> error side channel;
* trace (user_id % 25) nests consistently inside unit (user_id % 5)
  because 5 | 25;
* repeated (node, trace) pairs and duplicate (src,pred,dst) triples with
  distinct timestamps -> exercises set-union + last-writer-wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ATYPE = {"click": "FILE", "view": "REGISTRY", "signup": "PROCESS",
          "purchase": "NETWORK", "error": "MODULE"}
_ACTION = {"click": "CREATE", "view": "REG_SET", "signup": "LAUNCH",
           "purchase": "CONNECT", "error": "LOAD"}


def sigraph_events(events: DataFrame) -> DataFrame:
    """Spark rendering of the mapping (pure Column expressions)."""
    atype = F.lit(None).cast("string")
    action = F.lit(None).cast("string")
    for et, t in _ATYPE.items():
        atype = F.when(F.col("event_type") == et, t).otherwise(atype)
        action = F.when(F.col("event_type") == et, _ACTION[et]).otherwise(action)
    actor = (
        F.when(F.col("event_id") % 3 == 0, "READ_RECV")
        .when(F.col("event_id") % 3 == 1, "WRITE_SEND")
        .otherwise("NOT_ACTOR")
    )
    name = F.concat(F.lit("a@"), (F.col("user_id") % 40).cast("string"))
    sp = F.when(F.col("event_id") % 97 == 0, F.lit("invalid")).otherwise(
        F.concat_ws("@", name, atype, action, actor)
    )
    has_parent = F.col("event_id") % 5 != 0
    pname = F.concat(F.lit("proc_"), (F.col("user_id") % 7).cast("string"), F.lit(".exe"))
    rule_ids = F.when(
        F.col("event_id") % 20 == 0,
        F.array(
            F.concat(F.lit("rule-"), (F.col("event_id") % 4).cast("string")),
            F.concat(F.lit("rule-"), (F.col("event_id") % 6).cast("string")),
        ),
    )
    return events.select(
        F.concat(F.lit("tr-"), (F.col("user_id") % 25).cast("string")).alias("trace_id"),
        F.concat(F.lit("span-"), F.col("event_id").cast("string")).alias("span_id"),
        F.concat(F.lit("u-"), (F.col("user_id") % 5).cast("string")).alias("unit_id"),
        sp.alias("system_provenance"),
        F.col("ts").alias("timestamp"),
        (F.col("event_id") % 9 + 1).cast("int").alias("weight"),
        F.when(has_parent, pname).alias("process_name"),
        rule_ids.alias("related_rule_ids"),
        F.when(has_parent, F.concat(F.lit("span-p-"), (F.col("user_id") % 7).cast("string"))).alias("parent_span_id"),
        F.when(has_parent, F.concat(pname, F.lit("@PROCESS@LAUNCH@NOT_ACTOR"))).alias(
            "parent_system_provenance"
        ),
    )


# DuckDB CTE: the SAME mapping plus the parse ground truth (the oracle does
# not re-parse the string — it constructs node_id/label/action/direction
# directly, which is exactly what makes it an oracle for the parser).
SEVENTS_CTE = """
sevents AS (
  SELECT
    'tr-' || CAST(user_id % 25 AS VARCHAR) AS trace_id,
    'span-' || CAST(event_id AS VARCHAR) AS span_id,
    'u-' || CAST(user_id % 5 AS VARCHAR) AS unit_id,
    ts AS timestamp,
    CAST(event_id % 9 + 1 AS INT) AS weight,
    (event_id % 97 = 0) AS is_invalid,
    (event_id % 5 <> 0) AS has_parent,
    CASE WHEN event_id % 5 <> 0
         THEN 'proc_' || CAST(user_id % 7 AS VARCHAR) || '.exe' END AS process_name,
    'a@' || CAST(user_id % 40 AS VARCHAR) AS art_name,
    CASE event_type WHEN 'click' THEN 'FILE' WHEN 'view' THEN 'REGISTRY'
         WHEN 'signup' THEN 'PROCESS' WHEN 'purchase' THEN 'NETWORK'
         ELSE 'MODULE' END AS label,
    CASE event_type WHEN 'click' THEN 'CREATE' WHEN 'view' THEN 'REG_SET'
         WHEN 'signup' THEN 'LAUNCH' WHEN 'purchase' THEN 'CONNECT'
         ELSE 'LOAD' END AS action,
    CASE event_id % 3 WHEN 0 THEN 'READ_RECV' WHEN 1 THEN 'WRITE_SEND'
         ELSE 'NOT_ACTOR' END AS actor_type,
    CASE WHEN event_id % 5 <> 0
         THEN 'proc_' || CAST(user_id % 7 AS VARCHAR) || '.exe@PROCESS' END AS parent_id,
    CASE WHEN event_id % 20 = 0 THEN
      ['rule-' || CAST(event_id % 4 AS VARCHAR), 'rule-' || CAST(event_id % 6 AS VARCHAR)]
    END AS related_rule_ids,
    event_id
  FROM events
),
parsed AS (
  SELECT *, art_name || '@' || label AS node_id
  FROM sevents WHERE NOT is_invalid
)
"""
