"""WARC source: build spec-conformant fixtures with make_warc_bytes,
then read them back through the real binaryFile → mapInPandas path —
round-trip, gzip members, in-parser filters, truncation tolerance,
and the documents-shape projection feeding strip_markup."""

from __future__ import annotations

import gzip

import pytest

from sparvi_core_spark.sources.warc import (
    iter_warc_records,
    make_warc_bytes,
    make_warc_record,
    read_warc,
    warc_to_documents,
)

HTML = b"<html><body><h1>Title</h1><p>Hello crawl world</p></body></html>"


def _fixture_records():
    return [
        make_warc_record(
            "http://a.example.com/",
            HTML,
            record_id="<urn:uuid:1>",
        ),
        make_warc_record(
            "http://a.example.com/",
            b"warcinfo: test",
            warc_type="warcinfo",
            record_id="<urn:uuid:2>",
        ),
        make_warc_record(
            "http://b.example.com/missing",
            b"gone",
            record_id="<urn:uuid:3>",
            http_status=404,
            http_content_type="text/plain",
        ),
        make_warc_record(
            "http://c.example.com/img",
            b"\x89PNG...",
            record_id="<urn:uuid:4>",
            http_content_type="image/png",
        ),
    ]


def test_iter_records_plain_and_gzip():
    recs = _fixture_records()
    for gz in (False, True):
        raw = make_warc_bytes(recs, gzip_members=gz)
        parsed = list(iter_warc_records(raw))
        assert [r["record_id"] for r in parsed] == [
            "<urn:uuid:1>",
            "<urn:uuid:2>",
            "<urn:uuid:3>",
            "<urn:uuid:4>",
        ]
        r0 = parsed[0]
        assert r0["warc_type"] == "response"
        assert r0["target_uri"] == "http://a.example.com/"
        assert r0["http_status"] == 200
        assert r0["http_content_type"] == "text/html"
        assert r0["body"] == HTML
        # non-response payloads pass through undissected
        assert parsed[1]["http_status"] is None
        assert parsed[1]["body"] == b"warcinfo: test"
        assert parsed[2]["http_status"] == 404
        assert parsed[3]["http_content_type"] == "image/png"


def test_truncated_tail_yields_partial_then_stops():
    recs = _fixture_records()
    raw = make_warc_bytes(recs[:2])
    # chop into the middle of the second record's payload
    cut = raw[: raw.index(b"warcinfo: test") + 4]
    parsed = list(iter_warc_records(cut))
    assert len(parsed) == 2
    assert parsed[0]["body"] == HTML  # first record intact
    assert parsed[1]["body"] == b"warc"  # tail: what was there
    # corrupt gzip tail: never raises either
    gz = make_warc_bytes(recs[:2], gzip_members=True)
    parsed = list(iter_warc_records(gz[: len(gz) // 2]))
    assert all(p["record_id"] == "<urn:uuid:1>" for p in parsed)


def test_read_warc_roundtrip(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "seg0.warc").write_bytes(make_warc_bytes(_fixture_records()))
    (p / "seg1.warc.gz").write_bytes(
        make_warc_bytes(
            [
                make_warc_record(
                    "http://d.example.com/",
                    b"<p>second file</p>",
                    record_id="<urn:uuid:5>",
                )
            ],
            gzip_members=True,
        )
    )
    df = read_warc(spark, str(p))
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {f"<urn:uuid:{i}>" for i in range(1, 6)}
    assert rows["<urn:uuid:1>"]["body"] == HTML
    assert rows["<urn:uuid:5>"]["body"] == b"<p>second file</p>"
    assert rows["<urn:uuid:5>"]["path"].endswith("seg1.warc.gz")

    # in-parser type filter: non-response records never become rows
    only_resp = read_warc(spark, str(p), warc_types=["response"])
    assert {r["warc_type"] for r in only_resp.collect()} == {"response"}
    assert only_resp.count() == 4

    # source-side body cap bounds what leaves the scan
    capped = read_warc(spark, str(p), max_body_bytes=5).collect()
    assert all(len(r["body"]) <= 5 for r in capped)
    # content_length still reports the REAL payload size
    full = {r["record_id"]: r["content_length"] for r in capped}
    assert full["<urn:uuid:2>"] == len(b"warcinfo: test")


def test_warc_to_documents_feeds_text_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparvi_core_spark.functions.text import strip_markup

    f = tmp_path / "seg.warc.gz"
    f.write_bytes(make_warc_bytes(_fixture_records(), gzip_members=True))
    docs = warc_to_documents(read_warc(spark, str(f), warc_types=["response"]))
    rows = {r["doc_id"]: r for r in docs.collect()}
    # 404 and image/png rows are gone; only the 200 text/html page stays
    assert set(rows) == {"<urn:uuid:1>"}
    assert rows["<urn:uuid:1>"]["url"] == "http://a.example.com/"
    stripped = docs.select(strip_markup("text").alias("t")).first()["t"]
    assert "Hello crawl world" in stripped and "<p>" not in stripped


def test_malformed_utf8_body_decodes_lossily(spark, tmp_path):
    """Real crawl bodies routinely contain invalid UTF-8; the ingest
    path must decode with replacement, not abort the job (strict
    F.decode raises MALFORMED_CHARACTER_CODING under Spark 4 on the
    first bad byte). Verdict must match Python's
    bytes.decode('utf-8', 'replace')."""
    body = b"latin1 caf\xe9 and truncated \xc3 plus \xff\xfe noise"
    recs = [
        make_warc_record(
            "http://bad.example.com/", body, record_id="<urn:uuid:bad>"
        ),
        make_warc_record(
            "http://ok.example.com/", HTML, record_id="<urn:uuid:ok>"
        ),
    ]
    f = tmp_path / "bad.warc.gz"
    f.write_bytes(make_warc_bytes(recs, gzip_members=True))
    docs = warc_to_documents(read_warc(spark, str(f), warc_types=["response"]))
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == {"<urn:uuid:bad>", "<urn:uuid:ok>"}
    assert rows["<urn:uuid:bad>"] == body.decode("utf-8", "replace")
    assert rows["<urn:uuid:ok>"] == HTML.decode("utf-8")


def test_garbage_input_yields_nothing():
    assert list(iter_warc_records(b"not a warc at all")) == []
    assert list(iter_warc_records(b"")) == []
    assert list(iter_warc_records(gzip.compress(b"random payload"))) == []


def test_streaming_warc_ingest(spark, tmp_path):
    """read_warc_stream drains landed segments via availableNow and a
    later-landed file arrives in the next run — the standing-crawl
    shape (exactly-once file tracking is the file source's)."""
    from sparvi_core_spark.sources.warc import read_warc_stream
    from sparvi_core_spark.streaming.profile_stream import run_stream_to_memory

    d = tmp_path / "landing"
    d.mkdir()
    (d / "seg0.warc.gz").write_bytes(
        make_warc_bytes(_fixture_records(), gzip_members=True)
    )
    stream = read_warc_stream(
        spark, str(d), warc_types=["response"], max_files_per_trigger=1
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "warc_stream_t", output_mode="append")
    # seg0 holds 4 records of which 3 are responses (warcinfo filtered)
    first = spark.table("warc_stream_t").count()
    assert first == 3
    # a new segment lands; a fresh availableNow run picks it up
    (d / "seg1.warc.gz").write_bytes(
        make_warc_bytes(
            [
                make_warc_record(
                    "http://e.example.com/", b"<p>late</p>",
                    record_id="<urn:uuid:9>",
                )
            ],
            gzip_members=True,
        )
    )
    run_stream_to_memory(stream, "warc_stream_t2", output_mode="append")
    ids = {r["record_id"] for r in spark.table("warc_stream_t2").collect()}
    assert "<urn:uuid:9>" in ids and len(ids) == 4
