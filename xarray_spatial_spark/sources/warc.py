"""WARC / WET reader and writer (ISO 28500, from scratch).

Common Crawl publishes crawls as ``.warc.gz`` (raw HTTP captures) and
``.warc.wet.gz`` (extracted-text ``conversion`` records); this module
turns them into the ``input_hint`` table shape
``(url, warc_ts, html, text, lang)`` without any external WARC
library.  The record grammar is the public WARC 1.0/1.1 spec:

    WARC/1.0 CRLF  (header-lines) CRLF CRLF  (block of Content-Length
    bytes)  CRLF CRLF

and Common Crawl's ``.gz`` layout is one gzip MEMBER per record,
concatenated — which is what makes a 1 GB crawl file seekable by the
(file, offset) pairs in the CDX index.

Scale shape
-----------
* ``read_warc`` parallelizes at FILE granularity via the binaryFile
  source: a Common Crawl dump is ~72k files x ~1 GB, so file-level
  parallelism saturates any cluster long before per-file splitting
  matters.  gzip members are decompressed ONE RECORD AT A TIME
  (streaming ``zlib`` with ``unused_data`` hand-off), so peak task
  memory is the compressed file + one decompressed record, never the
  whole decompressed file.
* Record-type and ``max_payload`` filters apply INSIDE the parser —
  skipped record payloads are never materialized into Arrow batches
  (the moral equivalent of predicate pushdown for a format Spark
  cannot split).
* Every row carries ``(warc_file, warc_offset)`` lineage, the same
  coordinates the CDX index uses, so a downstream stage can re-fetch
  any single record with a ranged read instead of a rescan.
* ``write_warc`` renders per-record gzip members inside
  ``mapInPandas`` (one output file per task, CC-style), keeping the
  writer a narrow map with no exchange.

Reference parity: the reference engine has no crawl-format reader —
this source exists for the north-star input shape (BASELINE.json
``input_hint``); record semantics follow the public WARC spec only.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"

#: output schema of :func:`read_warc` (DDL).
WARC_SCHEMA = (
    "warc_file string, warc_offset long, record_type string, "
    "url string, warc_ts timestamp, content_type string, "
    "http_status int, payload binary"
)


# ---------------------------------------------------------------------------
# record rendering (writer side)
# ---------------------------------------------------------------------------


def warc_record_bytes(
    record_type: str,
    block: bytes,
    url: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str | None = None,
    record_id: str | None = None,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One spec-shaped WARC record.  ``record_id`` defaults to a
    deterministic urn derived from (url, date) — no RNG, so renders
    are byte-stable across retries/partitionings."""
    if record_id is None:
        seed = zlib.crc32(f"{url}|{date}|{record_type}".encode()) & 0xFFFFFFFF
        record_id = f"<urn:uuid:00000000-0000-4000-8000-{seed:012x}>"
    lines = [b"WARC/1.0"]
    headers = [
        ("WARC-Type", record_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
    ]
    if url is not None:
        headers.append(("WARC-Target-URI", url))
    if content_type is not None:
        headers.append(("Content-Type", content_type))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(block))))
    for k, v in headers:
        lines.append(f"{k}: {v}".encode())
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=UTF-8",
) -> bytes:
    """HTTP/1.1 response head + body — the block of a ``response``
    record (``Content-Type: application/http; msgtype=response``)."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def response_record(url: str, html: bytes, date: str, status: int = 200) -> bytes:
    return warc_record_bytes(
        "response",
        http_response_block(html, status),
        url=url,
        date=date,
        content_type="application/http; msgtype=response",
    )


def conversion_record(url: str, text: str, date: str) -> bytes:
    """WET-style extracted-text record."""
    return warc_record_bytes(
        "conversion", text.encode(), url=url, date=date, content_type="text/plain"
    )


def warcinfo_record(fields: dict[str, str] | None = None) -> bytes:
    body = b"".join(
        f"{k}: {v}\r\n".encode()
        for k, v in (fields or {"software": "xarray_spatial_spark"}).items()
    )
    return warc_record_bytes(
        "warcinfo", body, content_type="application/warc-fields"
    )


def gzip_member(record: bytes) -> bytes:
    """One deterministic gzip member (mtime=0) — CC's per-record layout."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(record)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# parsing (reader side)
# ---------------------------------------------------------------------------


def _parse_one(raw: bytes, start: int):
    """Parse the record whose ``WARC/`` magic starts at ``start``.
    Returns (headers dict lower-cased, block bytes, next_offset) or
    None when the remainder is blank padding."""
    if raw[start : start + 5] != b"WARC/":
        rest = raw[start:].strip()
        if not rest:
            return None
        raise ValueError(f"bad WARC magic at offset {start}")
    hdr_end = raw.index(CRLF + CRLF, start)
    headers: dict[str, str] = {}
    for line in raw[start:hdr_end].split(CRLF)[1:]:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    n = int(headers["content-length"])
    block_start = hdr_end + 4
    block = raw[block_start : block_start + n]
    if len(block) != n:
        raise ValueError(
            f"truncated WARC record at offset {start}: "
            f"Content-Length {n}, got {len(block)}"
        )
    return headers, block, block_start + n + 4  # skip CRLF CRLF trailer


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response block -> (status, payload content-type, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    status, ctype = None, None
    head = block[:sep].decode("utf-8", "replace").split("\r\n")
    parts = head[0].split(None, 2)
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, block[sep + 4 :]


def _iter_members(data: bytes):
    """Yield (offset, decompressed_bytes) per gzip member — streaming,
    one member resident at a time.  Non-gzip input yields itself."""
    if data[:2] != b"\x1f\x8b":
        yield 0, data
        return
    view = memoryview(data)  # zero-copy member hand-off (O(n), not O(n^2))
    offset = 0
    while offset < len(data):
        if data[offset : offset + 2] != b"\x1f\x8b":
            if not data[offset:].strip(b"\x00"):
                return
            raise ValueError(f"garbage between gzip members at {offset}")
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        chunk = d.decompress(view[offset:])
        while not d.eof:
            tail = d.unconsumed_tail
            if not tail:
                raise ValueError(f"truncated gzip member at {offset}")
            chunk += d.decompress(tail)
        consumed = len(data) - offset - len(d.unused_data)
        yield offset, chunk
        offset += consumed


def parse_warc_bytes(
    data: bytes,
    warc_file: str = "",
    record_types: tuple[str, ...] | None = None,
    max_payload: int | None = None,
):
    """Yield record dicts from one WARC(.gz) byte string.  Offsets are
    COMPRESSED-stream offsets for .gz input (CDX convention) and raw
    offsets otherwise.  ``record_types``/``max_payload`` skip rows
    before payload materialization."""
    for member_off, raw in _iter_members(data):
        pos = 0
        while pos < len(raw):
            parsed = _parse_one(raw, pos)
            if parsed is None:
                break
            headers, block, pos = parsed
            rtype = headers.get("warc-type", "")
            if record_types is not None and rtype not in record_types:
                continue
            status, payload_ctype, payload = None, headers.get("content-type"), block
            if rtype == "response":
                status, payload_ctype, payload = _split_http(block)
            if max_payload is not None and len(payload) > max_payload:
                continue
            ts = None
            d = headers.get("warc-date")
            if d:
                ts = datetime.fromisoformat(d.replace("Z", "+00:00")).replace(
                    tzinfo=timezone.utc
                )
            yield {
                "warc_file": warc_file,
                "warc_offset": member_off,
                "record_type": rtype,
                "url": headers.get("warc-target-uri"),
                "warc_ts": ts,
                "content_type": payload_ctype,
                "http_status": status,
                "payload": payload,
            }


# ---------------------------------------------------------------------------
# DataFrame reader / writer
# ---------------------------------------------------------------------------


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response", "conversion"),
    max_payload: int | None = None,
) -> DataFrame:
    """``path`` (glob ok) of ``.warc`` / ``.warc.gz`` / ``.wet.gz``
    files -> records DataFrame (:data:`WARC_SCHEMA`).  One task per
    file (gzip is unsplittable; CC-scale inputs have >> files than
    cores, see module docstring)."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches):
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = list(
                    parse_warc_bytes(
                        bytes(content),
                        warc_file=path_.rsplit("/", 1)[-1],
                        record_types=record_types,
                        max_payload=max_payload,
                    )
                )
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def warc_documents(records: DataFrame) -> DataFrame:
    """records -> the ``input_hint`` document shape
    ``(url, warc_ts, html, text, lang)``: ``response`` rows carry html
    and derive text via :func:`extract_text`; ``conversion`` (WET)
    rows carry text directly with null html."""
    from xarray_spatial_spark.functions.text import langid
    from xarray_spatial_spark.sources.documents import extract_text

    is_resp = F.col("record_type") == "response"
    html = F.when(is_resp, F.col("payload"))
    text = F.when(is_resp, extract_text(F.col("payload"))).otherwise(
        F.decode("payload", "UTF-8")
    )
    return records.filter(
        F.col("record_type").isin("response", "conversion")
        & F.col("url").isNotNull()
    ).select(
        "url",
        "warc_ts",
        html.alias("html"),
        text.alias("text"),
        langid(text).alias("lang"),
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    ts_col: str = "warc_ts",
    per_record_gzip: bool = True,
) -> None:
    """Render rows as ``response`` records, one ``part-NNNNN.warc[.gz]``
    per task (CC layout: concatenated per-record gzip members behind a
    leading warcinfo member).  Narrow map — no exchange; repartition
    upstream to choose file count/size."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    sel = df.select(
        F.col(url_col).alias("url"),
        F.col(html_col).alias("html"),
        F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        F.spark_partition_id().alias("pid"),
    )

    def _write(batches):
        first, out, pid = True, None, 0
        for pdf in batches:
            for url, html, ts in zip(pdf["url"], pdf["html"], pdf["ts"]):
                if first:
                    pid = int(pdf["pid"].iloc[0])
                    ext = ".warc.gz" if per_record_gzip else ".warc"
                    out = open(f"{out_dir}/part-{pid:05d}{ext}", "wb")
                    info = warcinfo_record()
                    out.write(gzip_member(info) if per_record_gzip else info)
                    first = False
                rec = response_record(url, bytes(html), ts)
                out.write(gzip_member(rec) if per_record_gzip else rec)
        if out is not None:
            out.close()
            yield pd.DataFrame({"pid": [pid]})

    sel.mapInPandas(_write, schema="pid int").count()


# ---------------------------------------------------------------------------
# CDX(J) index — the (urlkey, file, offset) lookup table beside a crawl
# ---------------------------------------------------------------------------
#
# Common Crawl ships a CDXJ index per crawl: lines of
# ``<urlkey> <timestamp> <json>`` sorted by SURT urlkey, where the
# json carries (url, filename, offset, length, status, mime, digest).
# With it, one record is a ranged read instead of a file scan — the
# consumer of read_warc's (warc_file, warc_offset) lineage columns.
#
# SURT (Sort-friendly URI Reordering Transform) subset implemented:
# scheme dropped, host lower-cased with labels reversed and
# comma-joined, default ports dropped, ``)/`` + path + query.  Pure
# Catalyst strings (scan-stage at any scale).
#
# write_cdx performs the one global exchange the format REQUIRES
# (range-partition + sort within partitions = totally ordered part
# files, the standard distributed sort); read_cdx is a narrow parse
# over spark.read.text.


def surt_key(url) -> "F.Column":
    """SURT urlkey of a URL column (documented subset above)."""
    from xarray_spatial_spark.functions.url import url_host

    host = url_host(url)
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(rev, F.lit(")"), path)


def cdx_from_warc(records: DataFrame) -> DataFrame:
    """read_warc records -> CDX columns (one row per response/
    conversion record)."""
    return records.filter(F.col("url").isNotNull()).select(
        surt_key(F.col("url")).alias("urlkey"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts"),
        "url",
        F.col("warc_file").alias("filename"),
        F.col("warc_offset").alias("offset"),
        F.octet_length("payload").alias("length"),
        F.col("http_status").alias("status"),
        F.col("content_type").alias("mime"),
        F.sha1("payload").alias("digest"),
    )


def write_cdx(cdx: DataFrame, out_dir: str, partitions: int | None = None) -> None:
    """CDXJ text files, globally ordered by (urlkey, ts): range
    exchange + in-partition sort; part file N's keys all precede part
    file N+1's."""
    line = F.concat_ws(
        " ",
        "urlkey",
        "ts",
        F.to_json(
            F.struct("url", "filename", "offset", "length", "status",
                     "mime", "digest")
        ),
    )
    df = cdx.repartitionByRange(
        partitions or cdx.sparkSession.sparkContext.defaultParallelism,
        "urlkey", "ts",
    ).sortWithinPartitions("urlkey", "ts").select(line.alias("value"))
    df.write.mode("overwrite").text(out_dir)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ files -> typed CDX DataFrame (inverse of write_cdx)."""
    t = spark.read.text(path)
    urlkey = F.regexp_extract("value", r"^(\S+) ", 1)
    ts = F.regexp_extract("value", r"^\S+ (\d{14}) ", 1)
    js = F.regexp_extract("value", r"^\S+ \d{14} (.*)$", 1)
    schema = ("url string, filename string, offset long, length int, "
              "status int, mime string, digest string")
    return t.select(
        urlkey.alias("urlkey"), ts.alias("ts"),
        F.from_json(js, schema).alias("j"),
    ).select("urlkey", "ts", "j.*")


def fetch_cdx_record(cdx_row, warc_dir: str) -> dict:
    """Driver-side ranged fetch of ONE record from its CDX row — the
    lookup path a service would serve; reads offset..EOF of one file
    and parses the first record (gzip members self-terminate)."""
    with open(f"{warc_dir}/{cdx_row['filename']}", "rb") as f:
        f.seek(cdx_row["offset"])
        data = f.read()
    return next(iter(parse_warc_bytes(data)))


def wat_records(records: DataFrame) -> DataFrame:
    """WARC records -> WAT-style metadata rows: everything a link/
    metadata consumer needs WITHOUT shipping page payloads — the
    fourth member of the Common-Crawl format family here (WARC/WET
    read+write, CDX index, WAT metadata).

    One row per ``response`` record: ``(url, warc_ts, wat)`` where
    ``wat`` is a JSON envelope in the WAT spirit —
    ``Envelope.WARC-Header-Metadata`` (URI/date/type),
    ``Envelope.Payload-Metadata.HTML-Metadata`` (title, description,
    canonical, charset, robots flags, outlinks, image count) and
    ``Container`` (filename/offset, the CDX-convention lineage).
    Pure Catalyst: page_metadata + extract_links feed one ``to_json``
    over a nested struct, so the metadata sweep is a single scan
    stage with NO Python and no exchange; payload bytes never leave
    the scan."""
    from xarray_spatial_spark.functions.html import (
        _unescape_entities,
        extract_images,
        page_metadata,
    )
    from xarray_spatial_spark.functions.url import extract_links

    html = F.col("payload")
    meta = page_metadata(html)
    links = extract_links(html, F.col("url"))
    envelope = F.struct(
        F.struct(
            F.col("url").alias("WARC-Target-URI"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("WARC-Date"),
            F.col("record_type").alias("WARC-Type"),
            F.col("content_type").alias("Content-Type"),
            F.length(html).cast("long").alias("Content-Length"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                _unescape_entities(meta["title"]).alias("Title"),
                _unescape_entities(meta["description"])
                .alias("Description"),
                meta["canonical"].alias("Canonical"),
                meta["charset"].alias("Charset"),
                meta["robots"]["noindex"].alias("Robots-Noindex"),
                meta["robots"]["nofollow"].alias("Robots-Nofollow"),
                links.alias("Links"),
                F.size(extract_images(html, F.col("url")))
                .cast("int").alias("Image-Count"),
            ).alias("HTML-Metadata"),
        ).alias("Payload-Metadata"),
    )
    container = F.struct(
        F.col("warc_file").alias("Filename"),
        F.col("warc_offset").alias("Offset"),
    )
    wat = F.to_json(F.struct(envelope.alias("Envelope"),
                             container.alias("Container")))
    return records.filter(
        (F.col("record_type") == "response") & F.col("url").isNotNull()
    ).select("url", "warc_ts", wat.alias("wat"))
