"""OpenSearch ``_bulk`` NDJSON sink for the event stream.

The reference indexes every syslog event into OpenSearch through the python
client's ``streaming_bulk`` — one action dict per document,
``{"_op_type": "index", "_index": idx, "_source": model_dump()}`` over
``SyslogModel(unit_id, span_id, trace_id, timestamp, tactics, rule_ids,
raw_data)`` (``/root/reference/src/db/db_session.py:65,127-140``,
``src/db/db_model.py:111-119``). That is a driver-side, single-connection
loop. The web-scale form is: RENDER the bulk request bodies as data (one
NDJSON action+source pair per document, the wire format of ``POST /_bulk``)
with a pure narrow map, and let each task ship its own shard.

Scale design:
* rendering is JVM-side string concat/replace — zero UDF, zero shuffle;
  every escape rule is restated in ANSI SQL by the gate oracle;
* ``write_bulk`` caps docs per output file (``maxRecordsPerFile``), so each
  part file IS one correctly-sized ``_bulk`` request body — the uploader is
  a dumb loop of ``curl --data-binary @part`` with no reframing;
* unlike the reference we set an explicit deterministic ``_id`` (span_id):
  bulk uploads at scale retry, and index-without-id duplicates documents on
  at-least-once delivery; a pinned _id makes every retry idempotent
  (same deviation class as the streaming ledger, SURVEY §1.2).

Escaping: the JSON string escapes that can occur in this data model —
backslash, quote, newline, CR, tab — as a fixed ``F.replace`` chain
(backslash first). Content stays inside whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_JSON_ENC = [
    ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
]


def json_escape(col: Column) -> Column:
    out = col
    for old, new in _JSON_ENC:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def _jstr(col: Column) -> Column:
    """JSON string literal, or ``null`` for NULL input."""
    return F.coalesce(
        F.concat(F.lit('"'), json_escape(col), F.lit('"')), F.lit("null")
    )


def _jarr(col: Column) -> Column:
    """JSON array of strings, or ``null`` for NULL input."""
    return F.coalesce(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    col, lambda x: F.concat(F.lit('"'), json_escape(x), F.lit('"'))
                ),
                ",",
            ),
            F.lit("]"),
        ),
        F.lit("null"),
    )


def bulk_index_lines(sevents: DataFrame, index: str = "syslog") -> DataFrame:
    """sigraph event table (``sources.events_map.sigraph_events`` shape) ->
    one row per document: the action line and the source line joined by a
    newline (the ``_bulk`` wire framing; a text sink then emits valid
    NDJSON bodies with no row-adjacency coordination).

    Source field order is FIXED (unit_id, span_id, trace_id, timestamp,
    tactics, rule_ids, raw_data) — mirroring ``SyslogModel.model_dump()``'s
    declaration order so bodies are byte-deterministic.
    """
    action = F.concat(
        F.lit('{"index":{"_index":"' + index + '","_id":'),
        _jstr(F.col("span_id")),
        F.lit("}}"),
    )
    raw = F.concat(
        F.lit('{"system_provenance":'), _jstr(F.col("system_provenance")),
        F.lit(',"process_name":'), _jstr(F.col("process_name")),
        F.lit(',"parent_span_id":'), _jstr(F.col("parent_span_id")),
        F.lit(',"weight":'), F.col("weight").cast("string"),
        F.lit("}"),
    )
    source = F.concat(
        F.lit('{"unit_id":'), _jstr(F.col("unit_id")),
        F.lit(',"span_id":'), _jstr(F.col("span_id")),
        F.lit(',"trace_id":'), _jstr(F.col("trace_id")),
        F.lit(',"timestamp":'), _jstr(F.date_format(F.col("timestamp"), _TS_FMT)),
        F.lit(',"tactics":null,"rule_ids":'), _jarr(F.col("related_rule_ids")),
        F.lit(',"raw_data":'), raw,
        F.lit("}"),
    )
    return sevents.select(F.concat(action, F.lit("\n"), source).alias("line"))


def write_bulk(
    lines: DataFrame, outdir: str, max_docs_per_file: int = 2000
) -> str:
    """Write ``_bulk`` request bodies: one text part file per <=
    ``max_docs_per_file`` documents (each row already carries its two
    NDJSON lines). Returns the upload loop command."""
    (
        lines.write.mode("overwrite")
        .option("maxRecordsPerFile", max_docs_per_file)
        .text(outdir)
    )
    return bulk_command(outdir)


def bulk_command(outdir: str, uri: str = "http://localhost:9200") -> str:
    """Upload loop for a ``write_bulk`` layout (one request per part file;
    bodies are already framed and idempotent under retry via pinned _id)."""
    return (
        f"for f in {os.path.join(outdir, 'part-*')}; do "
        f"curl -sf -XPOST '{uri}/_bulk' -H 'Content-Type: application/x-ndjson' "
        "--data-binary @$f -o /dev/null || exit 1; done"
    )


def index_template(index: str = "syslog") -> dict:
    """Index template for the documents ``bulk_index_lines`` emits —
    the counterpart of the reference's ``install_syslog_template_and_index``
    (db_model.py): ids/keywords exact-match, timestamp a date, raw_data
    sub-fields typed explicitly (no dynamic-mapping surprises — the
    documented SURVEY §1.2 deviation made concrete)."""
    kw = {"type": "keyword"}
    return {
        "index_patterns": [index + "*"],
        "template": {
            "mappings": {
                "dynamic": "strict",
                "properties": {
                    "unit_id": kw, "span_id": kw, "trace_id": kw,
                    "timestamp": {"type": "date"},
                    "tactics": kw,
                    "rule_ids": kw,
                    "raw_data": {
                        "properties": {
                            "system_provenance": kw,
                            "process_name": kw,
                            "parent_span_id": kw,
                            "weight": {"type": "long"},
                        }
                    },
                },
            }
        },
    }
