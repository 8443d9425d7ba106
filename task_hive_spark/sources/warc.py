"""WARC web-archive source/sink, pure stdlib.

WARC (ISO 28500 / the IIPC "WARC File Format 1.0" spec) is THE wire
format of web-scale corpus work — Common Crawl, the dominant public
100-TB-class pretraining source, ships as ``.warc.gz`` files — so a
training-data engine needs a first-class WARC ingestion path next to
its JSONL/CSV/Avro/protobuf readers (reference ingest analogue:
``tasks/spider.go:21-74``, the xlsx crawl-seed sheet). No ``warcio``
wheel is installable in this container (COVERAGE.md env-gate log), so
the record grammar is implemented directly from the public spec — the
sources/avro.py recipe applied to the web-archive container.

Format facts this module implements for real, not happy-path:

- A ``.warc.gz`` file is a CONCATENATION of independent gzip members,
  one WARC record per member (the Common Crawl packaging — it is what
  lets a streaming reader skip records without decompressing the whole
  file). The reader walks members via ``zlib.decompressobj`` +
  ``unused_data``; a member holding several records is legal and
  handled.
- A record is ``WARC/1.0 CRLF`` + named headers (case-insensitive,
  with RFC-822-style obs-fold continuation lines) + ``CRLF`` + exactly
  ``Content-Length`` payload bytes + ``CRLF CRLF``. All of that is
  enforced: version line, mandatory headers, byte-exact framing,
  terminator.
- ``WARC-Block-Digest`` / ``WARC-Payload-Digest`` carry
  ``sha1:<base32>`` checksums (the Common Crawl convention). The
  reader RECOMPUTES both and rejects mismatches — corruption inside a
  structurally-valid record is caught, the same end-to-end posture as
  the Ogg CRC walk and the FLAC STREAMINFO MD5.
- A ``response`` record's payload is a full HTTP/1.1 message; the
  reader parses the status line and headers, cross-checks the HTTP
  ``Content-Length`` against the actual body, and decodes the body by
  the ``charset`` parameter of ``Content-Type``.
- Each part file leads with a ``warcinfo`` record (the standard
  layout); non-response record types (warcinfo, request, metadata) are
  fully validated but yield no rows.

Distributed shape: the WRITER is one task per partition emitting an
independent part file (deterministic name + atomic rename — the Avro
sink's retry-idempotence discipline); the READER lists part files via
``binaryFile`` and decodes whole files inside ``mapInPandas``. A
single ``.warc.gz`` stream is byte-range splittable only by scanning
for gzip-member magic and validating a parse from the candidate
offset (there are no Avro-style sync markers); parallelism here comes
from many part files, which is exactly how Common Crawl ships (its
segments are ~1 GB files, thousands per crawl) — documented trade,
not a gap.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import os
import zlib

from pyspark.sql import DataFrame, SparkSession

_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def _sha1_b32(data: bytes) -> str:
    """``sha1:<base32>`` labelled digest (32 chars, no padding — the
    Common Crawl convention)."""
    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode("ascii")


def _warc_date(doc_id: int) -> str:
    """Deterministic per-doc UTC timestamp (WARC-Date is mandatory)."""
    day = 1 + doc_id % 28
    sec = (doc_id * 37) % 86400
    h, rem = divmod(sec, 3600)
    m, s = divmod(rem, 60)
    return f"2024-01-{day:02d}T{h:02d}:{m:02d}:{s:02d}Z"


def _record_id(doc_id: int, kind: str) -> str:
    h = hashlib.md5(f"warc-{kind}-{doc_id}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _encode_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """One uncompressed WARC record; Content-Length and both digests
    are computed here so writer callers cannot desync them."""
    full = [
        ("WARC-Block-Digest", _sha1_b32(payload)),
        ("Content-Length", str(len(payload))),
    ]
    out = bytearray(_VERSION + _CRLF)
    for name, value in list(headers) + full:
        out += f"{name}: {value}".encode("utf-8") + _CRLF
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def _http_response(lang: str, body: bytes) -> bytes:
    head = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/plain; charset=utf-8" + _CRLF
        + ("Content-Language: %s" % lang).encode("ascii") + _CRLF
        + ("Content-Length: %d" % len(body)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + body


def encode_response_record(doc_id: int, lang: str, text: str) -> bytes:
    """One ``response`` record: the document text as an HTTP/1.1
    payload, identity riding the target URI (the crawl-native place
    for it), payload digest over the HTTP body per the spec."""
    body = text.encode("utf-8")
    payload = _http_response(lang, body)
    headers = [
        ("WARC-Type", "response"),
        ("WARC-Record-ID", _record_id(doc_id, "response")),
        ("WARC-Date", _warc_date(doc_id)),
        ("WARC-Target-URI", f"https://corpus.example/{lang}/doc/{doc_id}"),
        ("Content-Type", "application/http; msgtype=response"),
        ("WARC-Payload-Digest", _sha1_b32(body)),
    ]
    return _encode_record(headers, payload)


def encode_warcinfo_record(part_id: int) -> bytes:
    fields = (
        b"software: task-hive-spark warc writer" + _CRLF
        + b"format: WARC File Format 1.0" + _CRLF
    )
    headers = [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", _record_id(part_id, "warcinfo")),
        ("WARC-Date", _warc_date(0)),
        ("Content-Type", "application/warc-fields"),
    ]
    return _encode_record(headers, fields)


def _parse_headers(block: bytes) -> tuple[dict[str, str], int]:
    """Parse the header section ending at the blank line; returns the
    (case-insensitively keyed) header map and the payload offset.
    Continuation lines (leading SP/HT) fold into the previous value
    per the spec's RFC-822 inheritance; duplicate names reject (the
    framing headers must be unambiguous)."""
    pos = block.find(_CRLF)
    if pos < 0 or block[:pos] != _VERSION:
        raise ValueError("missing or unsupported WARC version line")
    pos += 2
    headers: dict[str, str] = {}
    last: str | None = None
    while True:
        end = block.find(_CRLF, pos)
        if end < 0:
            raise ValueError("header section is not CRLF-terminated")
        line = block[pos:end]
        pos = end + 2
        if line == b"":
            return headers, pos
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise ValueError("continuation line before any header")
            headers[last] += " " + line.strip().decode("utf-8")
            continue
        sep = line.find(b":")
        if sep <= 0:
            raise ValueError(f"malformed header line: {line[:40]!r}")
        name = line[:sep].decode("ascii").strip().lower()
        value = line[sep + 1 :].decode("utf-8").strip()
        if name in headers:
            raise ValueError(f"duplicate header: {name}")
        headers[name] = value
        last = name


def _check_digest(label: str, claimed: str, data: bytes) -> None:
    algo, _, want = claimed.partition(":")
    if algo.lower() != "sha1":
        raise ValueError(f"{label}: unsupported digest algorithm {algo!r}")
    got = _sha1_b32(data).partition(":")[2]
    if got != want:
        raise ValueError(f"{label} mismatch: stored {want} computed {got}")


def parse_record(block: bytes, pos: int = 0) -> tuple[dict, int]:
    """Parse ONE record starting at ``pos``; returns (record, next_pos).
    record = {type, headers, payload}. Every framing rule is enforced;
    the block digest is verified when present (our writer always
    writes it)."""
    headers, body_at = _parse_headers(block[pos:])
    body_at += pos
    if "warc-type" not in headers:
        raise ValueError("record is missing WARC-Type")
    try:
        n = int(headers["content-length"])
    except KeyError:
        raise ValueError("record is missing Content-Length") from None
    except ValueError:
        raise ValueError("Content-Length is not an integer") from None
    if n < 0 or body_at + n + 4 > len(block):
        raise ValueError("payload overruns the record block")
    payload = block[body_at : body_at + n]
    if block[body_at + n : body_at + n + 4] != _CRLF + _CRLF:
        raise ValueError("record is missing the CRLFCRLF terminator")
    if "warc-block-digest" in headers:
        _check_digest("WARC-Block-Digest", headers["warc-block-digest"], payload)
    return (
        {"type": headers["warc-type"], "headers": headers, "payload": payload},
        body_at + n + 4,
    )


def _parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Status, headers, body of an HTTP/1.1 message; the HTTP
    Content-Length is cross-checked against the actual body length."""
    split = payload.find(_CRLF + _CRLF)
    if split < 0:
        raise ValueError("HTTP payload has no header/body split")
    head_lines = payload[:split].split(_CRLF)
    status_parts = head_lines[0].split(b" ", 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/1."):
        raise ValueError(f"malformed HTTP status line: {head_lines[0][:40]!r}")
    status = int(status_parts[1])
    http_headers: dict[str, str] = {}
    for line in head_lines[1:]:
        sep = line.find(b":")
        if sep <= 0:
            raise ValueError(f"malformed HTTP header: {line[:40]!r}")
        http_headers[line[:sep].decode("ascii").strip().lower()] = (
            line[sep + 1 :].decode("utf-8").strip()
        )
    body = payload[split + 4 :]
    if "content-length" in http_headers and int(http_headers["content-length"]) != len(
        body
    ):
        raise ValueError(
            f"HTTP Content-Length {http_headers['content-length']} != body {len(body)}"
        )
    return status, http_headers, body


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";")[1:]:
        k, _, v = part.strip().partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip('"').lower() or "utf-8"
    return "utf-8"


def iter_warc_gz(content: bytes):
    """Yield every record of a ``.warc.gz`` byte string, walking gzip
    members via ``unused_data`` (zlib verifies each member's CRC-32 and
    ISIZE; trailing garbage that is not a gzip member rejects)."""
    buf = content
    while buf:
        if buf[:2] != _GZ_MAGIC:
            raise ValueError("expected a gzip member, found garbage")
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        block = d.decompress(buf)
        if not d.eof:
            raise ValueError("truncated gzip member")
        tail = d.unused_data
        # flush() after eof returns nothing; member fully decoded
        pos = 0
        while pos < len(block):
            rec, pos = parse_record(block, pos)
            yield rec
        buf = tail


def extract_doc(rec: dict) -> tuple[int, str, str] | None:
    """(doc_id, lang, text) from a ``response`` record; None for other
    record types. The payload digest is verified against the HTTP body
    here — the read path never serves silently-corrupt text."""
    if rec["type"] != "response":
        return None
    headers = rec["headers"]
    status, http_headers, body = _parse_http_response(rec["payload"])
    if status != 200:
        return None
    if "warc-payload-digest" in headers:
        _check_digest("WARC-Payload-Digest", headers["warc-payload-digest"], body)
    uri = headers.get("warc-target-uri", "")
    parts = uri.rstrip("/").split("/")
    # https://corpus.example/{lang}/doc/{doc_id}
    if len(parts) < 3 or parts[-2] != "doc":
        raise ValueError(f"response record with unrecognized target URI {uri!r}")
    doc_id = int(parts[-1])
    lang = parts[-3]
    text = body.decode(_charset_of(http_headers.get("content-type", "")))
    return doc_id, lang, text


def write_warc_gz(path: str, records: list[tuple[int, str, str]], part_id: int = 0) -> int:
    """One part file: a warcinfo record then one response record per
    doc, each its own gzip member (mtime pinned to 0 so a task retry
    rewrites byte-identical output)."""
    # level 6 (the warcio/wget default): per-record members compress
    # ~2x faster than level 9 for ~1% size on this payload mix, and the
    # output stays deterministic (fixed level + mtime=0), which the
    # atomic-rename retry discipline relies on
    out = bytearray(
        gzip.compress(encode_warcinfo_record(part_id), compresslevel=6, mtime=0)
    )
    for doc_id, lang, text in records:
        out += gzip.compress(
            encode_response_record(int(doc_id), lang, text), compresslevel=6, mtime=0
        )
    with open(path, "wb") as f:
        f.write(bytes(out))
    return len(records)


def write_warc_dir(df: DataFrame, out_dir: str) -> int:
    """Distributed sink: one ``.warc.gz`` per partition, deterministic
    names via temp + atomic rename (retry-idempotent, the Avro sink
    discipline). Returns total response records written."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        import uuid

        from pyspark import TaskContext

        rows: list[tuple[int, str, str]] = []
        for pdf in batches:
            rows += list(zip(pdf["doc_id"].astype(int), pdf["lang"], pdf["text"]))
        part_id = TaskContext.get().partitionId()
        name = f"part-{part_id:05d}.warc.gz"
        tmp = os.path.join(out_dir, f".part-{part_id:05d}-{uuid.uuid4().hex[:8]}.tmp")
        n = write_warc_gz(tmp, rows, part_id)
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n": [n]})

    parts = df.select("doc_id", "lang", "text").mapInPandas(
        write_part, schema="file string, n long"
    )
    return sum(r["n"] for r in parts.collect())


def _decode_content_batches(batches):
    """mapInPandas closure decoding whole ``.warc.gz`` payloads to doc
    rows — shared by the batch reader and the landing-zone stream."""
    import pandas as pd

    for pdf in batches:
        ids: list[int] = []
        langs: list[str] = []
        texts: list[str] = []
        for content in pdf["content"]:
            for rec in iter_warc_gz(bytes(content)):
                doc = extract_doc(rec)
                if doc is not None:
                    ids.append(doc[0])
                    langs.append(doc[1])
                    texts.append(doc[2])
        yield pd.DataFrame({"doc_id": ids, "lang": langs, "text": texts})


_DOC_SCHEMA = "doc_id long, lang string, text string"
_BIN_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_dir(spark: SparkSession, in_dir: str) -> DataFrame:
    """Distributed source: ``binaryFile`` over the part files, whole-
    file member walk per task (see the module docstring for the
    split-at-member-boundaries trade)."""
    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.warc.gz"))
    return files.select("content").mapInPandas(_decode_content_batches, _DOC_SCHEMA)


def ingest_warc_landing(
    spark: SparkSession, landing_dir: str, out_dir: str, checkpoint: str
):
    """INCREMENTAL crawl ingestion: a landing directory that crawlers
    drop ``.warc.gz`` segments into, consumed exactly once per file by
    a ``binaryFile`` file-stream (Structured Streaming's file-source
    log is the ledger — a re-run with the same checkpoint ingests only
    files it has not seen), decoded by the same member walk as the
    batch reader, appended to a parquet corpus. ``Trigger.AvailableNow``
    drains whatever has landed and stops — the anti-entropy-sweep
    cadence (streaming/lifecycle.py's T4 discipline) applied to
    ingestion. Returns the finished query's last progress."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BIN_SCHEMA)
        .load(os.path.join(landing_dir, "*.warc.gz"))
    )
    docs = files.select("content").mapInPandas(_decode_content_batches, _DOC_SCHEMA)
    q = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.lastProgress


# --- splittable range reader ----------------------------------------------
# Common Crawl ships ~1 GB .warc.gz segments; at 100 TB a reader that
# can only parallelize per-file leaves long stragglers. Gzip has no
# Avro-style sync markers, so the split rule is RESYNC-BY-VALIDATION,
# the standard practice for member-per-record gzip: scan the split's
# range for the 3-byte gzip magic (\\x1f\\x8b\\x08), then accept a
# candidate only if the member decompresses cleanly (CRC-32 + ISIZE
# checked by zlib) AND the plaintext opens with the WARC version line.
# A false accept needs bytes inside a member's DEFLATE stream that are
# simultaneously a valid gzip member with a correct CRC and a valid
# record grammar — negligible, and the every-offset property test pins
# that no such position exists in real output. Ownership: a split
# [start, end) owns every member whose first byte lies in the range
# (reading past `end` to finish its last member), so each member is
# decoded exactly once across any split grid — the read_avro_dir_split
# contract without the format's help.


def _try_member(f, off: int) -> tuple[bytes, int] | None:
    """Decompress the gzip member starting at ``off``; returns
    (plaintext, next_member_offset), or None if ``off`` does not start
    a valid member whose plaintext opens with the WARC version line."""
    f.seek(off)
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    out = bytearray()
    fed = 0
    checked = False
    try:
        while not d.eof:
            chunk = f.read(1 << 20)
            if not chunk:
                return None  # truncated member
            fed += len(chunk)
            out += d.decompress(chunk)
            if not checked and len(out) >= 10:
                if bytes(out[:10]) != _VERSION + _CRLF:
                    return None
                checked = True
    except zlib.error:
        return None
    if not checked and bytes(out[:10]) != _VERSION + _CRLF:
        return None
    return bytes(out), off + fed - len(d.unused_data)


def _scan_member(f, start: int, end: int, file_size: int) -> int | None:
    """First offset in [start, end) that starts a VALIDATED gzip
    member; None when the range owns no member."""
    lim = min(end, file_size)
    f.seek(start)
    window = f.read(lim - start + 2)  # +2: magic may straddle lim-1
    at = 0
    while True:
        hit = window.find(_GZ_MAGIC + b"\x08", at)
        if hit < 0 or start + hit >= lim:
            return None
        if _try_member(f, start + hit) is not None:
            return start + hit
        at = hit + 1


def _decode_warc_split(path: str, start: int, end: int) -> list[tuple[int, str, str]]:
    """Decode the members a split [start, end) owns (module-level so
    the fuzz tests can drive it directly)."""
    out: list[tuple[int, str, str]] = []
    with open(path, "rb") as f:
        file_size = os.fstat(f.fileno()).st_size
        off = 0 if start == 0 else _scan_member(f, start, end, file_size)
        if off is None:
            return out
        while off < min(end, file_size):
            got = _try_member(f, off)
            if got is None:
                raise ValueError(f"corrupt gzip member at offset {off}")
            block, nxt = got
            pos = 0
            while pos < len(block):
                rec, pos = parse_record(block, pos)
                doc = extract_doc(rec)
                if doc is not None:
                    out.append(doc)
            off = nxt
    return out


def read_warc_dir_split(
    spark: SparkSession, in_dir: str, split_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed SPLITTABLE WARC source: the driver lists files and
    cuts byte-range splits (metadata-only); each task resyncs into its
    range and decodes only the members it owns. Rows are identical to
    read_warc_dir's at any split size; with split_bytes below the file
    size a single large archive genuinely fans out across tasks."""
    import glob as _glob

    import pandas as pd

    splits: list[tuple[str, int, int]] = []
    for path in sorted(_glob.glob(os.path.join(in_dir, "*.warc.gz"))):
        size = os.path.getsize(path)
        for off in range(0, max(size, 1), split_bytes):
            splits.append((path, off, min(off + split_bytes, size)))

    def decode(batches):
        for pdf in batches:
            ids: list[int] = []
            langs: list[str] = []
            texts: list[str] = []
            for path, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                for doc_id, lang, text in _decode_warc_split(path, int(s), int(e)):
                    ids.append(doc_id)
                    langs.append(lang)
                    texts.append(text)
            yield pd.DataFrame({"doc_id": ids, "lang": langs, "text": texts})

    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sdf = spark.createDataFrame(splits, "path string, start long, end long")
    return sdf.repartition(min(len(splits), nshuf) or 1).mapInPandas(
        decode, schema="doc_id long, lang string, text string"
    )


# --- round-trip query (banked; registration when a slot opens) -------------

_WARC_WRITTEN: dict[tuple[str, str], str] = {}


def src_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive ingest: the shared escaping-probe corpus
    (textfiles._derived) through the distributed WARC sink and back,
    profiled per language against the shared profile SQL — a green
    hash proves the gzip-member + record-grammar + HTTP + utf-8 path
    is byte-lossless end to end, with BOTH spec digests verified on
    every record read. Held OUT of the registered QUERIES until a
    filler slot opens (front capacity, __spark_entry__._FRONT_R13);
    the pytest gate covers it meanwhile."""
    import tempfile

    from task_hive_spark.sources.textfiles import _derived, _profile
    from task_hive_spark.streaming.lifecycle import _scratch_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _WARC_WRITTEN:
        out = tempfile.mkdtemp(prefix="ingest_warc_", dir=_scratch_root())
        write_warc_dir(_derived(spark, sf_dir), out)
        _WARC_WRITTEN[key] = out
    return _profile(read_warc_dir(spark, _WARC_WRITTEN[key]))


def _oracle() -> str:
    from task_hive_spark.sources.textfiles import _PROFILE_SQL

    return _PROFILE_SQL


SRC_WARC_ORACLE = _oracle()
