"""WARC (Web ARChive, ISO 28500) source — the format CommonCrawl
ships, i.e. THE ingest format of a web-scale training-data pipeline.
Zero dependencies: the record framing is parsed with stdlib ``gzip`` /
``io`` + byte ops, and the Spark side is ``binaryFile`` → Arrow-batched
``mapInPandas`` (one file per task — the same unit of work CommonCrawl
distributes, ~1 GB per WARC).

No analog in the reference engine (its sources are warehouses/files;
SURVEY.md §2.1) — this extends the source axis the way
``operators.multimodal`` extends the column-type axis: real format,
real parser, self-built fixtures.

Format essentials implemented here (WARC/1.0 and 1.1):

- A record = header block (``WARC/1.0`` version line + ``Name: value``
  lines, CRLF, terminated by an empty line) + ``Content-Length`` OCTETS
  of payload + CRLF CRLF separator.
- ``.warc.gz`` files are a CONCATENATION of gzip members, ONE RECORD
  PER MEMBER (the spec's recommendation and CommonCrawl's practice) —
  that is what makes the format splittable in principle; stdlib
  ``gzip`` decompresses concatenated members transparently.
- ``response`` records carry an HTTP message as payload: status line +
  HTTP headers + body; :func:`read_warc` surfaces the status code,
  Content-Type, and raw body bytes.

Scale design (the part that matters at 100 TB):

- ``binaryFile`` gives (path, bytes) rows with Spark handling
  transport for ANY supported filesystem (s3a/hdfs/local) — no
  Python-side FS clients on executors. One WARC file is one task;
  CommonCrawl segments are ~1 GB, the intended task granularity, and
  ``spark.sql.files.maxPartitionBytes`` never splits binary files
  mid-record.
- The parser is a STREAMING scan over the decompressed byte stream
  (records are yielded one at a time and emitted in Arrow batches) —
  peak executor memory is file bytes + one record, not a
  fully-materialized record list.
- Everything downstream is a normal DataFrame: filter on
  ``warc_type == 'response'`` / status / content-type happens before
  any text processing, so the heavy HTML bodies the filter drops never
  leave the scan stage.

Record-level behavior is pinned by tests against fixture files BUILT
by :func:`make_warc_bytes` (the same write-then-read discipline as the
AVI/WAV codecs), including multi-member gzip, truncation tolerance,
and HTTP payload dissection.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, content_length long, body binary"
)

_MAX_HEADER = 64 * 1024  # spec headers are small; a corrupt stream
# without a blank line must not buffer unboundedly


def _read_headers(stream: io.BufferedIOBase) -> tuple[dict, bool]:
    """Read a CRLF-terminated header block → ({lower_name: value},
    found_version_line). Returns ({}, False) at EOF / on garbage."""
    headers: dict[str, str] = {}
    version = False
    total = 0
    # skip blank separator lines between records
    line = stream.readline()
    while line in (b"\r\n", b"\n"):
        line = stream.readline()
    if not line:
        return {}, False
    if not line.startswith(b"WARC/"):
        return {}, False
    version = True
    while True:
        line = stream.readline()
        total += len(line)
        if not line or line in (b"\r\n", b"\n") or total > _MAX_HEADER:
            break
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().lower().decode("ascii", "replace")] = (
                value.strip().decode("utf-8", "replace")
            )
    return headers, version


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP response payload → (status, content_type, body).
    Non-HTTP payloads come back as (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
        if not sep:
            return None, None, payload
    lines = head.split(b"\n")
    status: int | None = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        if ln.lower().startswith(b"content-type:"):
            ctype = (
                ln.partition(b":")[2].strip().decode("utf-8", "replace")
            )
            break
    return status, ctype, body


def iter_warc_records(raw: bytes, gzipped: bool | None = None) -> Iterator[dict]:
    """Yield parsed records from WARC bytes, one dict at a time.

    ``gzipped=None`` auto-detects from the magic bytes. Concatenated
    per-record gzip members decompress transparently. A truncated final
    record (a crawler died mid-write — common in the wild) yields what
    was read and stops; it never raises.
    """
    if gzipped is None:
        gzipped = raw[:2] == b"\x1f\x8b"
    stream: io.BufferedIOBase
    if gzipped:
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    while True:
        try:
            headers, ok = _read_headers(stream)
        except (OSError, EOFError):  # corrupt gzip tail
            return
        if not ok:
            return
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        try:
            payload = stream.read(length)
        except (OSError, EOFError):
            return
        status, http_ctype, body = _parse_http(payload)
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ctype,
            "content_length": len(payload),
            "body": body,
        }
        if len(payload) < length:
            return  # truncated tail


def read_warc(
    spark,
    path: str,
    warc_types: list[str] | None = None,
    max_body_bytes: int | None = None,
) -> DataFrame:
    """WARC file(s) → DataFrame, one row per record.

    (path, record_id, warc_type, target_uri, warc_date, content_type,
    http_status, http_content_type, content_length, body). For
    ``response`` records the HTTP envelope is dissected: ``body`` is
    the HTTP BODY and ``http_status``/``http_content_type`` come from
    the embedded response; other records carry their raw payload.

    ``warc_types`` filters INSIDE the parser (e.g. ``["response"]`` —
    request/metadata records never become rows); ``max_body_bytes``
    truncates bodies at source, bounding Arrow batch size against
    pathological pages. Both are the knobs a 100 TB crawl ingest needs
    ON the scan, not after it.
    """
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(
        _make_parser(warc_types, max_body_bytes), schema=WARC_SCHEMA
    )


def _make_parser(warc_types: list[str] | None, max_body_bytes: int | None):
    """The shared (path, content) → record-rows Arrow kernel for the
    batch and streaming readers (mapInPandas is stateless, so the same
    function is streaming-safe)."""
    keep = set(warc_types) if warc_types else None
    columns = (
        "path record_id warc_type target_uri warc_date content_type "
        "http_status http_content_type content_length body"
    ).split()

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in columns}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    if keep and rec["warc_type"] not in keep:
                        continue
                    body = rec["body"]
                    if max_body_bytes is not None:
                        body = body[:max_body_bytes]
                    out["path"].append(fpath)
                    out["body"].append(body)
                    for k in columns[1:-1]:
                        out[k].append(rec[k])
            yield pd.DataFrame(out)

    return parse


def warc_to_documents(
    warc_df: DataFrame,
    id_from: str = "record_id",
) -> DataFrame:
    """response-record WARC rows → the (doc_id, url, fetched_at, text)
    shape the text pipeline consumes. HTML tags are NOT stripped here —
    chain ``functions.text.strip_markup`` (that separation keeps this
    projection pure-columnar). Non-2xx and non-text rows are dropped.
    """
    from pyspark.sql import functions as F

    return (
        warc_df.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").between(200, 299)
            & (
                F.col("http_content_type").startswith("text/")
                | F.col("http_content_type").contains("html")
            )
        )
        .select(
            F.col(id_from).alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            # Lossy decode, still pure-JVM: binary→string cast wraps the
            # bytes unvalidated, make_valid_utf8 replaces invalid
            # sequences with U+FFFD (same result as Python's
            # bytes.decode('utf-8', 'replace')). Strict F.decode raises
            # MALFORMED_CHARACTER_CODING and would abort the whole job on
            # the first malformed body — and real web-crawl bodies
            # routinely contain malformed bytes.
            F.make_valid_utf8(F.col("body").cast("string")).alias("text"),
        )
    )


def read_warc_stream(
    spark,
    path: str,
    warc_types: list[str] | None = None,
    max_body_bytes: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WARC ingest: watch a directory for new crawl segments
    and emit parsed records continuously — the shape of a standing
    crawl pipeline (new CommonCrawl segment lands → records flow into
    the novelty screen / dedup streams downstream).

    Same schema and parser as :func:`read_warc`; the source is the
    file-stream ``binaryFile`` reader, so exactly-once file tracking,
    backfill via ``trigger(availableNow=True)``, and checkpointing are
    Spark's. ``max_files_per_trigger`` bounds micro-batch size (one
    segment ≈ 1 GB — a handful per trigger is the sane default on
    modest executors).
    """
    # the file-stream source requires an explicit schema; binaryFile's
    # is fixed by the format
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _make_parser(warc_types, max_body_bytes), schema=WARC_SCHEMA
    )


# ---------------------------------------------------------------- fixtures


def make_warc_record(
    uri: str,
    body: bytes,
    warc_type: str = "response",
    record_id: str | None = None,
    http_status: int = 200,
    http_content_type: str = "text/html",
    date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """One spec-conformant WARC/1.0 record (CRLF framing, octet-exact
    Content-Length) — the test-fixture builder."""
    if warc_type == "response":
        payload = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = "application/warc-fields"
    rid = record_id or f"<urn:uuid:{abs(hash((uri, warc_type))):032x}>"
    header = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return header + payload + b"\r\n\r\n"


def make_warc_bytes(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into a .warc (or member-per-record .warc.gz)
    byte string."""
    if not gzip_members:
        return b"".join(records)
    return b"".join(gzip.compress(r) for r in records)
