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
    assert out.columns == ["url", "warc_ts", "html", "lang"]
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


def _w10_records():
    import datetime

    return [
        ("https://a.example/1", datetime.datetime(2024, 1, 1, 0, 0, 5),
         b"<html>one</html>"),
        ("https://a.example/2", datetime.datetime(2024, 1, 1, 0, 0, 6),
         b"<html>\r\n\r\ntwo</html>", "text/html; charset=utf-8", 404),
        ("https://a.example/3", datetime.datetime(2024, 1, 2, 3, 4, 5),
         bytes(range(256)), "application/octet-stream", 200),
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc10_round_trip(spark, gz):
    """Real WARC/1.0: version+field header blocks, Content-Length
    framing, warcinfo skipping, HTTP status/mime extraction, binary
    bodies containing the record separator, and the Common Crawl
    per-record gzip-member layout."""
    import datetime

    from sigraph_spark.sources.warc import encode_warc10, read_warc10_segments

    blob = encode_warc10(_w10_records(), gzip_members=gz)
    segs = spark.createDataFrame(
        [("s-0", bytearray(blob))], "segment string, content binary"
    )
    rows = sorted(
        read_warc10_segments(segs).collect(), key=lambda r: r["record_idx"]
    )
    assert [r["url"] for r in rows] == [u for u, _, _, *_ in _w10_records()]
    assert [r["http_status"] for r in rows] == [200, 404, 200]
    assert rows[1]["mime"] == "text/html; charset=utf-8"
    assert bytes(rows[1]["payload"]) == b"<html>\r\n\r\ntwo</html>"
    assert bytes(rows[2]["payload"]) == bytes(range(256))
    assert rows[0]["warc_ts"] == datetime.datetime(2024, 1, 1, 0, 0, 5)


def test_warc10_malformed_raises():
    from sigraph_spark.sources.warc import _parse_warc10, encode_warc10

    good = encode_warc10(_w10_records())
    with pytest.raises(ValueError):
        list(_parse_warc10("s", good[: len(good) - 30]))  # truncated body
    with pytest.raises(ValueError):
        list(_parse_warc10("s", b"NOT-WARC/9.9\r\n\r\n"))
    # record without Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError):
        list(_parse_warc10("s", bad))
    # truncated gzip member
    gz = encode_warc10(_w10_records(), gzip_members=True)
    with pytest.raises(ValueError):
        list(_parse_warc10("s", gz[: len(gz) - 10]))


@pytest.mark.parametrize("coding", ["gzip", "deflate", "chunked",
                                    "chunked+gzip"])
def test_warc10_http_codings_removed(coding):
    import datetime

    from sigraph_spark.sources.warc import _parse_warc10, encode_warc10

    payload = b"<html>" + bytes(range(256)) * 3 + b"</html>"
    blob = encode_warc10([
        ("https://x/c", datetime.datetime(2024, 1, 1), payload,
         "text/html", 200, coding),
    ])
    rows = list(_parse_warc10("s", blob))
    assert bytes(rows[0][6]) == payload
    raw = list(_parse_warc10("s", blob, decode_body=False))
    assert bytes(raw[0][6]) != payload  # coding really was applied


def test_warc10_coding_failures_loud():
    import datetime

    from sigraph_spark.sources.warc import (
        _decode_http_body,
        _parse_warc10,
        encode_warc10,
    )

    with pytest.raises(ValueError):
        _decode_http_body({b"content-encoding": b"br"}, b"x")
    with pytest.raises(ValueError):
        _decode_http_body({b"transfer-encoding": b"gzip"}, b"x")
    with pytest.raises(ValueError):
        _decode_http_body(
            {b"transfer-encoding": b"chunked"}, b"5\r\nab"
        )  # truncated chunk
    # corrupt gzip body fails the record, not silently passes
    blob = bytearray(encode_warc10([
        ("https://x/g", datetime.datetime(2024, 1, 1), b"A" * 500,
         "text/html", 200, "gzip"),
    ]))
    at = bytes(blob).rindex(b"\x1f\x8b")
    blob[at + 20] ^= 0xFF
    with pytest.raises(Exception):
        list(_parse_warc10("s", bytes(blob)))


def test_warc10_pages_filter_and_pipeline_cli(spark, tmp_path):
    """End to end: real WARC/1.0 segments on disk -> binaryFile ->
    parse -> page contract (200s only) -> the checkpointed pipeline
    CLI consumes them via --warc-dir."""
    import datetime
    import json as _json
    import subprocess
    import sys

    from sigraph_spark.corpus import gen_pages
    from sigraph_spark.sources.warc import (
        encode_warc10, read_warc10_segments, warc_pages,
    )

    pages = gen_pages(spark, sf=0.0005).limit(40).collect()
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    recs = []
    for i, r in enumerate(pages):
        recs.append((
            r["url"], datetime.datetime(2024, 1, 1, 0, 0, i),
            bytes(r["html"]), "text/html",
            404 if i % 10 == 9 else 200,
            "gzip" if i % 3 == 0 else "",
        ))
    half = len(recs) // 2
    (warc_dir / "a.warc").write_bytes(encode_warc10(recs[:half]))
    (warc_dir / "b.warc.gz").write_bytes(
        encode_warc10(recs[half:], gzip_members=True)
    )
    segs = (
        spark.read.format("binaryFile").load(str(warc_dir))
        .selectExpr("path as segment", "content")
    )
    got = warc_pages(read_warc10_segments(segs))
    assert got.columns == ["url", "warc_ts", "html", "lang"]
    n200 = sum(1 for r in recs if r[4] == 200)
    assert got.count() == n200
    # the CLI path end to end (subprocess: own SparkSession)
    out = subprocess.run(
        [sys.executable, "jobs/run_pipeline.py",
         "--warc-dir", str(warc_dir),
         "--workdir", str(tmp_path / "kg"),
         "--master", "local[4]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=600, check=True,
    )
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["docs"] == n200


def test_warc10_distributed_writer_roundtrip(spark):
    import datetime

    from sigraph_spark.sources.warc import (
        read_warc10_segments, write_warc10_pages,
    )

    base = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [(f"https://e.org/{i}", base + datetime.timedelta(seconds=i),
          bytearray(f"<html>{i}</html>".encode()))
         for i in range(60)],
        "url string, warc_ts timestamp, html binary",
    )
    segs = write_warc10_pages(pages, num_segments=7)
    assert segs.count() <= 7
    back = read_warc10_segments(segs)
    got = {r["url"]: bytes(r["payload"]) for r in back.collect()}
    assert len(got) == 60
    assert got["https://e.org/7"] == b"<html>7</html>"
    # determinism: a second build yields identical blobs
    a = {r["segment"]: bytes(r["content"]) for r in segs.collect()}
    b = {r["segment"]: bytes(r["content"])
         for r in write_warc10_pages(pages, num_segments=7).collect()}
    assert a == b
