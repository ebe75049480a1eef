"""WARC-style record source: concatenated binary web-archive segments ->
one row per page.

Common-Crawl-scale corpora arrive as a few hundred thousand multi-GB
WARC files, each a concatenation of length-delimited records — NOT a
splittable columnar format. The scalable ingest pattern (what this
module implements, minus the real gzip members the container can't
exercise) is:

* list the segment files as a DataFrame (``binaryFile`` data source or a
  manifest table) so Spark schedules ONE TASK PER SEGMENT — parallelism
  = number of files, the natural unit since records can't be split
  mid-stream;
* parse each segment inside ``mapInPandas`` (Arrow-batched; the parser
  is per-segment sequential by necessity, but segments are independent);
* emit typed columns + the raw payload as ``binary`` so everything
  downstream (extract -> triples -> graph) pushes down/prunes normally,
  and the blob is dropped from scans that don't need it.

The record format here is a deterministic WARC-lite framing (header
line with url/timestamp/length, then the payload), so round-trip tests
are exact without needing gzip/http parsing libraries. The framing
parser is the seam where a production warcio-based reader would drop in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

MAGIC = b"WARC-LITE/1"

RECORD_SCHEMA = StructType(
    [
        StructField("segment", StringType()),
        StructField("record_idx", LongType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("payload", BinaryType()),
    ]
)


def encode_records(records: list[tuple[str, "object", bytes]]) -> bytes:
    """Frame (url, ts, payload) records into one WARC-lite segment blob.

    Layout per record: ``WARC-LITE/1 <url> <iso-ts> <payload-len>\\n``
    followed by exactly payload-len bytes and a trailing newline.
    Deterministic — used by tests and the synthetic corpus writer.
    """
    out = bytearray()
    for url, ts, payload in records:
        header = b" ".join(
            [MAGIC, url.encode(), ts.isoformat().encode(), str(len(payload)).encode()]
        )
        out += header + b"\n" + payload + b"\n"
    return bytes(out)


def _parse_segment(name: str, blob: bytes):
    """Sequential WARC-lite frame parser for one segment. Malformed
    framing raises — a corrupt segment should fail its task loudly (and
    get retried / quarantined), not silently drop records."""
    import datetime

    pos, idx = 0, 0
    n = len(blob)
    while pos < n:
        eol = blob.index(b"\n", pos)
        header = blob[pos:eol]
        magic, url, ts, ln = header.split(b" ")
        if magic != MAGIC:
            raise ValueError(f"bad WARC-lite magic in {name} at byte {pos}")
        length = int(ln)
        start = eol + 1
        payload = blob[start : start + length]
        if len(payload) != length or blob[start + length : start + length + 1] != b"\n":
            raise ValueError(f"truncated record in {name} at byte {pos}")
        yield (
            name,
            idx,
            url.decode(),
            datetime.datetime.fromisoformat(ts.decode()),
            payload,
        )
        idx += 1
        pos = start + length + 1


def read_warc_segments(segments: DataFrame) -> DataFrame:
    """Explode a segment table ``(segment: string, content: binary)`` into
    typed page rows via mapInPandas (Arrow-batched; one sequential parse
    per segment, segments in parallel).

    With ``spark.read.format("binaryFile").load(dir)`` as the input, pass
    ``.selectExpr("path as segment", "content")``. The output keeps the
    payload as ``binary``; project it away before wide shuffles.
    """
    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["segment"], pdf["content"]):
                rows.extend(_parse_segment(name, bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["segment", "record_idx", "url", "warc_ts", "payload"]
            )

    return segments.mapInPandas(parse, schema=RECORD_SCHEMA)


def warc_pages(records: DataFrame) -> DataFrame:
    """Adapt parsed WARC records to the pipeline's page contract
    ``(url, warc_ts, html: binary)`` — the input_hint shape the KG
    pipeline stages consume."""
    return records.select(
        "url", "warc_ts", F.col("payload").alias("html")
    )


def write_warc_segments(
    spark: SparkSession,
    pages: list[tuple[str, "object", bytes]],
    out_dir: str,
    records_per_segment: int = 1000,
) -> DataFrame:
    """Pack pages into WARC-lite segment blobs and return them as a
    ``(segment, content)`` DataFrame (also a test helper for round-trip
    parity). Writing the blobs out is the caller's concern."""
    segs = []
    for i in range(0, len(pages), records_per_segment):
        chunk = pages[i : i + records_per_segment]
        segs.append((f"segment-{i // records_per_segment:05d}", encode_records(chunk)))
    return spark.createDataFrame(segs, "segment string, content binary")
