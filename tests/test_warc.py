"""WARC-lite segment source: round-trip parity, ordering, error path."""

from __future__ import annotations

import datetime

import pytest

from sigraph_spark.sources.warc import (
    encode_records, read_warc_segments, warc_pages, write_warc_segments,
)


def _pages(n: int):
    base = datetime.datetime(2024, 1, 1)
    return [
        (
            f"https://example.org/p/{i}",
            base + datetime.timedelta(seconds=i),
            (f"<html><body>doc {i} body éè</body></html>").encode(),
        )
        for i in range(n)
    ]


def test_warc_round_trip_exact(spark):
    pages = _pages(25)
    segs = write_warc_segments(spark, pages, "", records_per_segment=10)
    assert segs.count() == 3  # 10 + 10 + 5
    got = (
        read_warc_segments(segs)
        .orderBy("segment", "record_idx")
        .collect()
    )
    assert len(got) == len(pages)
    for row, (url, ts, payload) in zip(got, pages):
        assert row["url"] == url
        assert row["warc_ts"] == ts
        assert bytes(row["payload"]) == payload
    # record_idx restarts per segment (parallel-parse invariant)
    assert [r["record_idx"] for r in got[:12]] == list(range(10)) + [0, 1]


def test_warc_pages_contract(spark):
    pages = _pages(4)
    segs = write_warc_segments(spark, pages, "")
    out = warc_pages(read_warc_segments(segs))
    assert out.columns == ["url", "warc_ts", "html"]
    assert out.count() == 4


def test_warc_binary_payload_with_newlines(spark):
    """Length-delimited framing must survive payloads containing the
    delimiter and header-like bytes."""
    tricky = b"line1\nWARC-LITE/1 fake header\n\n\x00\xff binary"
    pages = [("https://e.org/x", datetime.datetime(2024, 1, 1), tricky)]
    segs = write_warc_segments(spark, pages, "")
    got = read_warc_segments(segs).collect()
    assert len(got) == 1
    assert bytes(got[0]["payload"]) == tricky


def test_warc_corrupt_segment_fails_loudly(spark):
    pages = _pages(2)
    blob = encode_records(pages)
    corrupt = blob[: len(blob) - 5]  # truncate the final record
    segs = spark.createDataFrame(
        [("seg-bad", corrupt)], "segment string, content binary"
    )
    with pytest.raises(Exception, match="truncated|Python worker"):
        read_warc_segments(segs).collect()
