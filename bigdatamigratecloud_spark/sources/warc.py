"""WARC (ISO 28500) web-archive source + sink — the first mile of a
pretraining-corpus pipeline (SURVEY §2.12): Common Crawl style
``*.warc.gz`` files become a DataFrame of records that feed straight
into ``operators/text.html_to_text_col`` and the curation stack.

Format notes (public spec + Common Crawl convention):
- a WARC file is a sequence of records, each ``WARC/1.0`` version line,
  CRLF header lines, a blank line, exactly ``Content-Length`` payload
  bytes, then ``\\r\\n\\r\\n``;
- Common Crawl gzips each record as its OWN gzip member and
  concatenates them, so a reader can stream records without decoding
  the whole file and an indexed reader can seek to member offsets —
  this writer follows that convention (Python's gzip module reads
  concatenated members transparently);
- ``response`` records carry a full HTTP response as payload (status
  line + headers + body); WET ``conversion`` records carry extracted
  plain text.

Scale design: one WARC file is one task — Common Crawl ships millions
of ~1 GB files, so file-level parallelism saturates any cluster; the
parser streams each gzip member and holds only ONE record in memory
(never the whole file, and the bytes never round-trip through the JVM
— the executor Python process opens the file path directly).  Paths
must therefore be executor-visible (local/NFS/fuse mounts; for object
stores, mount or use the ``binaryFile``-based fallback
:func:`read_warc_binary`).  The HTTP split and everything downstream
(html extract, quality, dedup) are JVM-side built-ins.
"""

from __future__ import annotations

import glob
import gzip
import os
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Core record fields; any OTHER WARC header lands in the `headers` map
# (the extension point custom pipelines use — the roundtrip entry
# carries table columns through it).
WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_file", T.StringType()),
    ]
)

_CORE = {
    "warc-type",
    "warc-record-id",
    "warc-date",
    "warc-target-uri",
    "content-type",
    "content-length",
}


def _record_guid(payload: bytes, uri: str) -> str:
    """Deterministic RFC-style record id from content+uri (sha256 prefix
    shaped as a urn:uuid) — replayable by any engine, like media.py's
    content_guid."""
    import hashlib

    h = hashlib.sha256(payload + uri.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    date_col: str | None = "warc_date",
    type_col: str | None = None,
    content_type_col: str | None = None,
    headers_col: str | None = None,
    warc_type: str = "response",
    content_type: str = "application/http; msgtype=response",
    default_date: str = "2026-01-01T00:00:00Z",
) -> None:
    """Distributed WARC sink: one ``part-<pid>.warc.gz`` per partition,
    each record its own gzip member (the Common Crawl layout).  Files
    are written executor-side (media.py's pattern), so ``out_dir``
    must be a shared filesystem on a cluster.  Record ids are
    content-derived (deterministic — a rewritten partition produces
    byte-identical records, which is what makes the roundtrip oracle
    and idempotent retries possible).  Custom headers (from
    ``headers_col``, a map column) must not contain CR/LF — enforced
    loudly, since a newline would desynchronize record framing."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col(uri_col).alias("__uri"), F.col(payload_col).alias("__payload")]
    cols.append(
        (F.col(date_col) if date_col and date_col in df.columns else F.lit(default_date)).alias("__date")
    )
    cols.append((F.col(type_col) if type_col else F.lit(warc_type)).alias("__type"))
    cols.append(
        (F.col(content_type_col) if content_type_col else F.lit(content_type)).alias("__ctype")
    )
    cols.append(
        (F.col(headers_col) if headers_col else F.lit(None).cast("map<string,string>")).alias("__hdrs")
    )
    rows = df.select(*cols)

    def write_partition(it) -> None:
        first = next(it, None)
        if first is None:
            return
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        tmp = path + ".tmp"
        import itertools

        with open(tmp, "wb") as raw:
            for row in itertools.chain([first], it):
                payload = bytes(row["__payload"]) if row["__payload"] is not None else b""
                uri = row["__uri"] or ""
                lines = [
                    b"WARC/1.0",
                    b"WARC-Type: " + str(row["__type"]).encode(),
                    b"WARC-Record-ID: " + _record_guid(payload, uri).encode(),
                    b"WARC-Date: " + str(row["__date"]).encode(),
                    b"WARC-Target-URI: " + uri.encode("utf-8"),
                    b"Content-Type: " + str(row["__ctype"]).encode(),
                    b"Content-Length: " + str(len(payload)).encode(),
                ]
                for k, v in sorted((row["__hdrs"] or {}).items()):
                    if any(c in f"{k}{v}" for c in "\r\n"):
                        raise ValueError(
                            f"write_warc: header {k!r} contains CR/LF — would "
                            "desynchronize WARC record framing"
                        )
                    if k.lower() in _CORE:
                        raise ValueError(
                            f"write_warc: header {k!r} collides with a core "
                            "WARC header; use the dedicated column instead"
                        )
                    lines.append(f"{k}: {v}".encode("utf-8"))
                rec = b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"
                # one gzip member per record (CC convention)
                raw.write(gzip.compress(rec))
        os.replace(tmp, path)

    rows.foreachPartition(write_partition)


def _parse_warc_stream(fh, source_file: str) -> Iterator[tuple]:
    """Yield WARC_SCHEMA tuples from a decompressed byte stream, one
    record at a time (constant memory in the record size)."""
    while True:
        line = fh.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"read_warc: expected WARC version line in {source_file}, "
                f"got {line[:40]!r}"
            )
        core: dict[str, str] = {}
        extra: dict[str, str] = {}
        while True:
            h = fh.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            k, v = k.strip(), v.strip()
            (core if k.lower() in _CORE else extra)[k.lower()] = v
        n = int(core.get("content-length", "0"))
        payload = fh.read(n)
        if len(payload) != n:
            raise ValueError(
                f"read_warc: truncated record in {source_file} "
                f"(wanted {n} payload bytes, got {len(payload)})"
            )
        yield (
            core.get("warc-type"),
            core.get("warc-record-id"),
            core.get("warc-date"),
            core.get("warc-target-uri"),
            core.get("content-type"),
            extra or None,
            payload,
            source_file,
        )


_WARC_BATCH_ROWS = 256


def _batched_frames(fh, source_file: str, batch_rows: int = _WARC_BATCH_ROWS):
    """Parse a WARC byte stream and yield pandas frames of at most
    ``batch_rows`` records — the shared memory bound of every WARC
    reader (mounted, object-store, and streaming): at most one batch
    of parsed rows is resident per task regardless of archive size."""
    import pandas as pd

    out = []
    for rec in _parse_warc_stream(fh, source_file):
        out.append(rec)
        if len(out) >= batch_rows:
            yield pd.DataFrame(out, columns=WARC_SCHEMA.names)
            out = []
    if out:
        yield pd.DataFrame(out, columns=WARC_SCHEMA.names)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: ``path`` is a directory (or glob) of ``*.warc.gz``
    (or plain ``*.warc``) files; returns WARC_SCHEMA rows.  One file =
    one task (the Common Crawl unit of parallelism); each task STREAMS
    its file — gzip members decode incrementally and only one
    256-record batch is resident at a time, so a 1 GB archive costs
    ~1 batch of executor memory, not 1 GB."""
    pattern = path if any(c in path for c in "*?[") else os.path.join(path, "*.warc*")
    files = sorted(f for f in glob.glob(pattern) if not f.endswith(".tmp"))
    if not files:
        raise FileNotFoundError(f"read_warc: no WARC files match {pattern}")
    paths = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        len(files)
    )

    def parse(batches):
        for pdf in batches:
            for p in pdf["path"]:
                opener = gzip.open if p.endswith(".gz") else open
                with opener(p, "rb") as fh:
                    yield from _batched_frames(fh, os.path.basename(p))

    return paths.mapInPandas(parse, WARC_SCHEMA)


def read_warc_binary(spark: SparkSession, path: str) -> DataFrame:
    """Object-store fallback: route the bytes through Spark's
    ``binaryFile`` source so any Hadoop-visible URI works without a
    local mount.  ``binaryFile`` necessarily holds the COMPRESSED blob
    per task (that is the source's contract), but nothing beyond it:
    decompression is incremental (``gzip.GzipFile`` over the buffer,
    never ``gzip.decompress``'s full expansion) and records leave in
    256-row batches via the shared helper — so a 1 GB monolith costs
    ~1 GB compressed + one batch, not compressed + decompressed + all
    parsed rows at once."""
    import io

    bf = spark.read.format("binaryFile").load(
        path if any(c in path for c in "*?[") else path.rstrip("/") + "/*.warc*"
    )

    def parse(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = io.BytesIO(bytes(content))
                fh = gzip.GzipFile(fileobj=buf) if p.endswith(".gz") else buf
                yield from _batched_frames(fh, os.path.basename(p))

    return bf.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def stream_warc(spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """STREAMING WARC ingestion — continuous crawl processing: archives
    landing in a directory become micro-batches of parsed records
    (Spark's file stream tracks seen files exactly-once; ``binaryFile``
    is a FileFormat, so FileStreamSource drives it like parquet).  The
    record parser is the SAME ``_parse_warc_stream`` the batch readers
    use, applied per micro-batch via ``mapInPandas`` — all downstream
    curation (http split, html extract, quality, dedup signatures) is
    stateless/narrow and streams unchanged.  One archive file = one
    task per trigger, the batch reader's parallelism contract."""
    import io

    bf = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(landing_dir.rstrip("/") + "/*.warc*")
    )

    def parse(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = io.BytesIO(bytes(content))
                fh = gzip.GzipFile(fileobj=buf) if p.endswith(".gz") else buf
                yield from _batched_frames(fh, os.path.basename(p))

    return bf.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def http_parts(payload: Column) -> Column:
    """Split an HTTP ``response`` payload into (status int, headers
    string, body string) — entirely JVM-side built-ins (UTF-8 decode,
    substring_index at the first blank line, one regexp for the status
    code), so the hot path never drops into Python.  Returns a struct
    column; non-HTTP payloads yield status NULL and the whole text as
    body."""
    s = F.decode(payload, "UTF-8")
    head = F.substring_index(s, "\r\n\r\n", 1)
    is_http = s.startswith("HTTP/")
    status = F.regexp_extract(s, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
    body_http = F.substring(s, F.length(head) + F.lit(5), F.length(s))
    return F.struct(
        F.when(is_http & (status != ""), status.cast("int")).alias("http_status"),
        F.when(is_http, head).alias("http_headers"),
        F.when(is_http, body_http).otherwise(s).alias("body"),
    )


def read_wet_text(spark: SparkSession, path: str) -> DataFrame:
    """WET convenience reader: ``conversion`` records (extracted plain
    text) as (target_uri, warc_date, text)."""
    return (
        read_warc(spark, path)
        .where(F.col("warc_type") == "conversion")
        .select(
            "target_uri",
            "warc_date",
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
    )
