"""WARC/WET source: spec-shaped render, streaming gzip-member parse,
distributed read == direct parse, input_hint projection."""

import gzip

import pytest
from pyspark.sql import functions as F

from xarray_spatial_spark.sources import warc as W


def _mk_records():
    recs = [W.warcinfo_record()]
    pages = []
    for i in range(5):
        url = f"http://site{i % 2}.example/p/{i}"
        text = f"hello page {i} words " * (i + 1)
        html = f"<html><body>{text.strip()}</body></html>".encode()
        ts = f"2026-03-0{i + 1}T12:00:0{i}Z"
        # a request record that readers must skip
        recs.append(
            W.warc_record_bytes(
                "request", b"GET /p HTTP/1.1\r\n\r\n", url=url, date=ts,
                content_type="application/http; msgtype=request")
        )
        recs.append(W.response_record(url, html, ts))
        pages.append((url, html, ts))
    return recs, pages


def test_parse_plain_and_gzip_equal():
    recs, pages = _mk_records()
    plain = b"".join(recs)
    gz = b"".join(W.gzip_member(r) for r in recs)
    for blob in (plain, gz):
        rows = list(W.parse_warc_bytes(blob, record_types=("response",)))
        assert len(rows) == 5
        for row, (url, html, ts) in zip(rows, pages):
            assert row["url"] == url
            assert bytes(row["payload"]) == html
            assert row["http_status"] == 200
            assert row["content_type"].startswith("text/html")
            assert row["warc_ts"].isoformat().startswith(ts[:-1])
    # no filter: warcinfo + request records also surface
    all_rows = list(W.parse_warc_bytes(gz, record_types=None))
    assert [r["record_type"] for r in all_rows[:3]] == [
        "warcinfo", "request", "response"]


def test_gzip_offsets_are_member_offsets():
    """Offsets must be compressed-stream member starts (the CDX
    convention) — a ranged read from that offset re-parses the row."""
    recs, _ = _mk_records()
    members = [W.gzip_member(r) for r in recs]
    blob = b"".join(members)
    rows = list(W.parse_warc_bytes(blob, record_types=("response",)))
    for row in rows:
        re_read = list(
            W.parse_warc_bytes(blob[row["warc_offset"]:],
                               record_types=("response",)))
        assert bytes(re_read[0]["payload"]) == bytes(row["payload"])


def test_truncation_raises_by_name():
    recs, _ = _mk_records()
    gz = b"".join(W.gzip_member(r) for r in recs)
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(W.parse_warc_bytes(gz[:-20]))
    plain = b"".join(recs)
    with pytest.raises(ValueError, match="truncated WARC record"):
        list(W.parse_warc_bytes(plain[:-30]))


def test_wet_conversion_records():
    recs = [
        W.conversion_record("http://a.example/x", "extracted text one",
                            "2026-04-01T00:00:00Z"),
        W.conversion_record("http://a.example/y", "text two",
                            "2026-04-01T00:00:01Z"),
    ]
    rows = list(W.parse_warc_bytes(b"".join(W.gzip_member(r) for r in recs)))
    assert [bytes(r["payload"]).decode() for r in rows] == [
        "extracted text one", "text two"]
    assert all(r["record_type"] == "conversion" for r in rows)
    assert all(r["http_status"] is None for r in rows)


def test_max_payload_filter_skips_big_records():
    recs, _ = _mk_records()
    rows = list(W.parse_warc_bytes(b"".join(recs),
                                   record_types=("response",),
                                   max_payload=60))
    assert 0 < len(rows) < 5
    assert all(len(bytes(r["payload"])) <= 60 for r in rows)


def test_distributed_roundtrip_and_documents_shape(spark, tmp_path):
    """write_warc (CC per-record-gzip layout) -> read_warc -> the
    written html is byte-identical; warc_documents matches the
    input_hint shape with extract_text parity."""
    from xarray_spatial_spark.sources.documents import documents

    src = documents(spark, 200, partitions=4)
    out = str(tmp_path / "crawl")
    W.write_warc(src, out)
    files = sorted(p.name for p in (tmp_path / "crawl").iterdir())
    assert len(files) == 4 and files[0].endswith(".warc.gz")
    # every member is a real gzip stream (readable by stock gunzip)
    with open(tmp_path / "crawl" / files[0], "rb") as f:
        assert gzip.decompress(f.read())  # multi-member ok

    got = W.read_warc(spark, out, record_types=("response",))
    docs = W.warc_documents(got)
    assert docs.columns == ["url", "warc_ts", "html", "text", "lang"]

    j = docs.alias("g").join(src.alias("s"), "url", "full")
    n_bad = j.filter(
        F.col("g.html").isNull() | F.col("s.html").isNull()
        | (F.col("g.html") != F.col("s.html"))
        | (F.col("g.text") != F.col("s.text"))
        | (F.col("g.warc_ts") != F.col("s.warc_ts"))
    ).count()
    assert n_bad == 0
    assert docs.count() == 200


def test_read_warc_lineage_columns(spark, tmp_path):
    from xarray_spatial_spark.sources.documents import documents

    out = str(tmp_path / "c2")
    W.write_warc(documents(spark, 40, partitions=2), out)
    rows = W.read_warc(spark, out).select(
        "warc_file", "warc_offset").distinct().collect()
    assert {r["warc_file"] for r in rows} == {
        "part-00000.warc.gz", "part-00001.warc.gz"}
    offs = sorted(r["warc_offset"] for r in rows
                  if r["warc_file"] == "part-00000.warc.gz")
    assert offs[0] > 0 and len(offs) == len(set(offs))  # past warcinfo


# ---------------------------------------------------------------------------
# CDX index
# ---------------------------------------------------------------------------


def test_surt_key_goldens(spark):
    from pyspark.sql import functions as F

    cases = [
        ("https://www.Example.COM/Path/X?b=2", "com,example,www)/path/x?b=2"),
        ("http://sub.site.co.uk/", "uk,co,site,sub)/"),
        ("https://host.org", "org,host)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["k"] for r in df.select(W.surt_key(F.col("url")).alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_cdx_roundtrip_and_global_order(spark, tmp_path):
    from pyspark.sql import functions as F

    from xarray_spatial_spark.sources.documents import documents

    crawl = str(tmp_path / "crawl")
    W.write_warc(documents(spark, 120, partitions=3), crawl)
    recs = W.read_warc(spark, crawl, record_types=("response",))
    cdx = W.cdx_from_warc(recs)
    out = str(tmp_path / "cdx")
    W.write_cdx(cdx, out, partitions=3)

    back = W.read_cdx(spark, out)
    assert back.count() == 120
    j = back.alias("b").join(cdx.alias("c"), ["urlkey", "ts"])
    assert j.filter(
        (F.col("b.offset") != F.col("c.offset"))
        | (F.col("b.filename") != F.col("c.filename"))
        | (F.col("b.digest") != F.col("c.digest"))
        | (F.col("b.length") != F.col("c.length"))
    ).count() == 0

    # global order: every part file sorted AND part N max < part N+1 min
    import glob

    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) >= 2
    prev_last = ""
    for p in parts:
        keys = [ln.split(" ", 1)[0] for ln in open(p) if ln.strip()]
        assert keys == sorted(keys), p
        if keys:
            assert prev_last <= keys[0], (prev_last, keys[0])
            prev_last = keys[-1]


def test_fetch_by_cdx_row(spark, tmp_path):
    from xarray_spatial_spark.sources.documents import documents

    crawl = str(tmp_path / "c3")
    src = documents(spark, 30, partitions=1)
    W.write_warc(src, crawl)
    cdx_rows = W.cdx_from_warc(
        W.read_warc(spark, crawl, record_types=("response",))).collect()
    row = sorted(cdx_rows, key=lambda r: r["urlkey"])[7]
    rec = W.fetch_cdx_record(row, crawl)
    assert rec["url"] == row["url"]
    assert len(bytes(rec["payload"])) == row["length"]


def test_crawl_to_corpus_end_to_end(spark, tmp_path):
    """Two snapshots of the same crawl (half the urls re-captured
    later) + short junk pages -> crawl_to_corpus keeps exactly the
    latest capture of each sufficiently-long page."""
    from xarray_spatial_spark.functions.corpus import crawl_to_corpus

    long_text = " ".join(
        ["the quick brown fox jumps over the lazy dogs and then runs far"]
        * 7)  # 84 alpha words incl. stop words (passes the gopher gate)

    def snap(tag, date, ids):
        recs = [W.warcinfo_record()]
        for i in ids:
            body = f"<html><body>{tag} {long_text} page {i}</body></html>"
            recs.append(W.response_record(
                f"http://c.ex/{i}", body.encode(), date))
        # one junk page per snapshot (too short -> gopher gate drops)
        recs.append(W.response_record(
            f"http://c.ex/junk{tag}", b"<html><body>tiny</body></html>",
            date))
        return b"".join(W.gzip_member(r) for r in recs)

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "snap1.warc.gz").write_bytes(
        snap("v1", "2026-01-01T00:00:00Z", range(10)))
    (d / "snap2.warc.gz").write_bytes(
        snap("v2", "2026-02-01T00:00:00Z", range(5)))

    out = crawl_to_corpus(W.read_warc(spark, str(d)), min_words=50)
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {f"http://c.ex/{i}" for i in range(10)}
    for i in range(10):
        want = "v2" if i < 5 else "v1"
        assert rows[f"http://c.ex/{i}"]["text"].startswith(want)
        assert rows[f"http://c.ex/{i}"]["warc_ts"].month == (
            2 if i < 5 else 1)


def test_wat_records(spark, tmp_path):
    """WAT metadata envelope: header/html-metadata/container fields
    round-trip through real gzip WARC files, links resolve, payload
    bytes never appear."""
    import gzip
    import json as _json

    from xarray_spatial_spark.sources import warc as w

    html = (b'<html><head><title>T1 &amp; T2</title>'
            b'<meta name="description" content="d1">'
            b'<meta name="robots" content="noindex">'
            b'<link rel="canonical" href="http://a.com/canon"></head>'
            b'<body><a href="/x">x</a><a href="http://b.com/y">y</a>'
            b'<img src="/i.png" alt="im"></body></html>')
    rec = w.response_record("http://a.com/p", html,
                            "2024-05-01T00:00:00Z")
    f = tmp_path / "t.warc.gz"
    f.write_bytes(w.gzip_member(w.warcinfo_record()) + w.gzip_member(rec))
    records = w.read_warc(spark, str(f))
    wat = w.wat_records(records).collect()
    assert len(wat) == 1
    row = wat[0]
    assert row.url == "http://a.com/p"
    env = _json.loads(row.wat)["Envelope"]
    hdr = env["WARC-Header-Metadata"]
    assert hdr["WARC-Target-URI"] == "http://a.com/p"
    assert hdr["WARC-Type"] == "response"
    assert hdr["Content-Length"] == len(html)
    hm = env["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Title"] == "T1 & T2"
    assert hm["Description"] == "d1"
    assert hm["Canonical"] == "http://a.com/canon"
    assert hm["Robots-Noindex"] is True and hm["Robots-Nofollow"] is False
    assert hm["Links"] == ["http://a.com/x", "http://b.com/y"]
    assert hm["Image-Count"] == 1
    cont = _json.loads(row.wat)["Container"]
    assert cont["Filename"] == "t.warc.gz" and cont["Offset"] > 0
    # metadata sweep never ships the page body
    assert "x</a>" not in row.wat

    plan = w.wat_records(records)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
