"""WARC source/sink (round 9): hand-built multi-record fixtures, the
streaming record splitter, HTTP envelope split, WET reader, and the
loud-failure contracts (truncation, framing, core-header collisions)."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from bigdatamigratecloud_spark.sources import warc


def _record(uri, payload, wtype=b"response", extra=b""):
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:test>\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Type: application/http\r\n"
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Two .warc.gz files, hand-assembled: one with two response records
    (the second with a custom header and a CRLF-bearing payload), one
    WET-style conversion record; a third PLAIN .warc file proves the
    non-gzip path."""
    d = tmp_path_factory.mktemp("warcfix")
    r1 = _record(b"http://a.example/1", b"HTTP/1.1 200 OK\r\n\r\nhello world")
    r2 = _record(
        b"http://a.example/2",
        b"HTTP/1.1 404 Not Found\r\n\r\nbody\r\nwith crlf",
        extra=b"X-Custom: v2\r\n",
    )
    # CC convention: each record its own gzip member, concatenated
    (d / "a.warc.gz").write_bytes(gzip.compress(r1) + gzip.compress(r2))
    wet = _record(b"http://a.example/3", "extracted text é".encode(), wtype=b"conversion")
    (d / "b.warc.gz").write_bytes(gzip.compress(wet))
    (d / "c.warc").write_bytes(_record(b"http://a.example/4", b"plain-file record"))
    return str(d)


def test_read_warc_fixture(spark, fixture_dir):
    rows = {r.target_uri: r for r in warc.read_warc(spark, fixture_dir).collect()}
    assert set(rows) == {f"http://a.example/{i}" for i in (1, 2, 3, 4)}
    assert bytes(rows["http://a.example/2"].payload).endswith(b"body\r\nwith crlf")
    assert rows["http://a.example/2"].headers == {"x-custom": "v2"}
    assert rows["http://a.example/1"].headers is None
    assert rows["http://a.example/3"].warc_type == "conversion"
    assert rows["http://a.example/4"].source_file == "c.warc"
    assert rows["http://a.example/1"].warc_date == "2026-01-02T03:04:05Z"


def test_http_parts_and_wet(spark, fixture_dir):
    df = warc.read_warc(spark, fixture_dir).select(
        "target_uri", warc.http_parts(F.col("payload")).alias("p")
    ).select("target_uri", "p.*")
    got = {r.target_uri: r for r in df.collect()}
    assert got["http://a.example/1"].http_status == 200
    assert got["http://a.example/1"].body == "hello world"
    assert got["http://a.example/2"].http_status == 404
    assert got["http://a.example/2"].body == "body\r\nwith crlf"
    # non-HTTP payload: status NULL, whole text as body
    assert got["http://a.example/3"].http_status is None
    assert got["http://a.example/3"].body == "extracted text é"
    wet = warc.read_wet_text(spark, fixture_dir).collect()
    assert [(r.target_uri, r.text) for r in wet] == [
        ("http://a.example/3", "extracted text é")
    ]


def test_binary_fallback_parity(spark, fixture_dir):
    a = sorted(
        (r.target_uri, bytes(r.payload)) for r in warc.read_warc(spark, fixture_dir).collect()
    )
    b = sorted(
        (r.target_uri, bytes(r.payload))
        for r in warc.read_warc_binary(spark, fixture_dir).collect()
    )
    assert a == b


def test_batched_frames_bounds_resident_rows():
    """The shared batching helper must yield <=256-row frames — the
    per-task memory bound of all three WARC readers (round-9 VERDICT:
    read_warc_binary used to materialize a whole archive's records)."""
    import io

    data = b"".join(
        _record(b"http://m.example/%d" % i, b"p%d" % i) for i in range(600)
    )
    sizes = [len(f) for f in warc._batched_frames(io.BytesIO(data), "m.warc")]
    assert sizes == [256, 256, 88]


def test_binary_fallback_many_records_chunked_parity(spark, tmp_path):
    """A >2-batch gzip archive through read_warc_binary: streamed
    decompression + chunked yield must reproduce read_warc exactly."""
    d = str(tmp_path / "many")
    os.makedirs(d)
    recs = [
        _record(b"http://m.example/%d" % i, b"payload-%d" % i) for i in range(600)
    ]
    with open(os.path.join(d, "m.warc.gz"), "wb") as fh:
        for r in recs:  # CC convention: one member per record
            fh.write(gzip.compress(r))
    a = sorted(
        (r.target_uri, bytes(r.payload))
        for r in warc.read_warc(spark, d).collect()
    )
    b = sorted(
        (r.target_uri, bytes(r.payload))
        for r in warc.read_warc_binary(spark, d).collect()
    )
    assert a == b and len(a) == 600


def test_roundtrip_preserves_bytes_and_headers(spark, tmp_path):
    rows = [
        (f"http://x/{i}", bytes([i, 13, 10, 0, 255]) * 3, {"X-K": f"v{i}"})
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, payload binary, headers map<string,string>"
    ).repartition(3)
    d = str(tmp_path / "w")
    warc.write_warc(df, d, headers_col="headers")
    back = sorted(
        (r.target_uri, bytes(r.payload), dict(r.headers))
        for r in warc.read_warc(spark, d).collect()
    )
    assert back == sorted((u, p, {"x-k": h["X-K"]}) for u, p, h in rows)
    # deterministic content-derived record ids
    ids = {r.target_uri: r.record_id for r in warc.read_warc(spark, d).collect()}
    warc.write_warc(df, str(tmp_path / "w2"), headers_col="headers")
    ids2 = {
        r.target_uri: r.record_id
        for r in warc.read_warc(spark, str(tmp_path / "w2")).collect()
    }
    assert ids == ids2


def test_loud_failures(spark, tmp_path, fixture_dir):
    import py4j.protocol

    # truncated payload must raise, not yield a short record
    d = tmp_path / "bad"
    d.mkdir()
    rec = _record(b"http://x/1", b"0123456789")
    (d / "t.warc.gz").write_bytes(gzip.compress(rec[: len(rec) - 14]))
    with pytest.raises(Exception, match="truncated"):
        warc.read_warc(spark, str(d)).collect()
    # garbage where a version line should be
    (d / "t.warc.gz").write_bytes(gzip.compress(b"NOT-A-WARC\r\n" + rec))
    with pytest.raises(Exception, match="version line"):
        warc.read_warc(spark, str(d)).collect()
    # no files
    with pytest.raises(FileNotFoundError):
        warc.read_warc(spark, str(tmp_path / "empty"))
    # CR/LF in custom headers and core-header collisions fail the write
    bad = spark.createDataFrame(
        [("http://x/1", b"p", {"X-Evil": "a\r\nInjected: yes"})],
        "target_uri string, payload binary, headers map<string,string>",
    )
    with pytest.raises(py4j.protocol.Py4JJavaError, match="CR/LF"):
        warc.write_warc(bad, str(tmp_path / "wb"), headers_col="headers")
    core = spark.createDataFrame(
        [("http://x/1", b"p", {"Content-Length": "9"})],
        "target_uri string, payload binary, headers map<string,string>",
    )
    with pytest.raises(py4j.protocol.Py4JJavaError, match="core WARC header"):
        warc.write_warc(core, str(tmp_path / "wc"), headers_col="headers")


def test_stream_warc_equals_batch(spark, tmp_path):
    """stream_warc over archives landing as files must equal the batch
    reader exactly (one record set, nothing dropped or duplicated
    across archive boundaries)."""
    import uuid

    from bigdatamigratecloud_spark.streaming.events import run_stream_to_memory

    rows = [
        (f"http://x/{i}", f"payload number {i}".encode(), None) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, payload binary, headers map<string,string>"
    ).repartition(5)  # 5 archives -> 5 micro-batches
    d = str(tmp_path / "land")
    warc.write_warc(df, d)
    qname = f"t_{uuid.uuid4().hex[:8]}_warc"
    run_stream_to_memory(warc.stream_warc(spark, d), qname)
    streamed = sorted(
        (r.target_uri, bytes(r.payload)) for r in spark.table(qname).collect()
    )
    batch = sorted(
        (r.target_uri, bytes(r.payload)) for r in warc.read_warc(spark, d).collect()
    )
    assert streamed == batch and len(streamed) == 30
