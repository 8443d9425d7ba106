"""Avro Object Container File source/sink, pure stdlib.

The container holds Spark's avro core jars but not the external
``spark-avro`` datasource module, so ``spark.read.format("avro")`` is
unavailable (and nothing can be downloaded). The Avro container format
itself is a public specification (Apache Avro 1.x, "Object Container
Files"): magic ``Obj\\x01``, a file-metadata map carrying the writer
schema JSON and the codec, a 16-byte sync marker, then blocks of
``(record count varint, byte size varint, payload, sync)`` with
zigzag-varint binary record encoding. For the flat record shape the
ingest tier uses (long + strings) that is fully implementable with the
stdlib — the sources/excel.py recipe (a real OOXML reader without
openpyxl) applied to Avro.

Distributed shape: the WRITER runs as one ``mapInPandas`` task per
partition, each emitting an independent container file (exactly how a
connector sink lays out part files); the READER lists the directory via
Spark's ``binaryFile`` source and decodes each container in a
``mapInPandas`` batch. Whole-file decode is the fixture-scale path; at
cluster scale a splittable reader seeks sync markers inside large
files — the same 16-byte markers this writer already emits per block,
so the layout is split-ready even though the fixture reader doesn't
need to split.

Codec support: ``null`` and ``deflate`` (raw DEFLATE, the spec's
required pair). Corrupt sync markers, bad magic, unknown codecs and
truncated blocks reject loudly.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"Obj\x01"

# the one record shape the ingest tier round-trips (textfiles._SCHEMA)
AVRO_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "text", "type": "string"},
    ],
}


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag_encode(len(raw)) + raw


def _dec_str(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _zigzag_decode(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError(f"bad string length {n}")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _sync_for(seed: bytes) -> bytes:
    """Deterministic 16-byte sync marker (the spec only requires the
    marker be file-unique; hashing the seed keeps runs reproducible)."""
    import hashlib

    return hashlib.md5(b"avro-sync-" + seed).digest()


def write_avro(
    path: str,
    records: list[tuple[int, str, str]],
    codec: str = "deflate",
    block_records: int = 256,
    sync_name: str | None = None,
) -> int:
    """Write one Avro Object Container File of (doc_id, lang, text)
    records. Returns the record count. ``sync_name`` lets a temp-file
    writer seed the sync marker from the FINAL name so the rename-based
    sink stays byte-reproducible across attempts."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = _sync_for(os.path.basename(sync_name or path).encode())
    meta = {
        "avro.schema": json.dumps(AVRO_SCHEMA, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        out.write(_enc_str(k))
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))  # end of metadata map
    out.write(sync)
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        body = bytearray()
        for doc_id, lang, text in chunk:
            body += _zigzag_encode(int(doc_id))
            body += _enc_str(lang)
            body += _enc_str(text)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw DEFLATE per spec
        out.write(_zigzag_encode(len(chunk)))
        out.write(_zigzag_encode(len(payload)))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return len(records)


def read_avro(content: bytes) -> list[tuple[int, str, str]]:
    """Decode one container's records; rejects bad magic, unknown
    codecs, corrupt sync markers and truncated blocks loudly."""
    if content[:4] != _MAGIC:
        raise ValueError(f"not an Avro container: {content[:4]!r}")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(content, pos)
        if n == 0:
            break
        if n < 0:
            # negative map-block counts (with a byte-size long) are
            # legal Avro but never written here — reject rather than
            # silently half-parse a foreign file
            raise ValueError("negative metadata map block count unsupported")
        for _ in range(n):
            k, pos = _dec_str(content, pos)
            ln, pos = _zigzag_decode(content, pos)
            if ln < 0 or pos + ln > len(content):
                raise ValueError("truncated metadata value")
            meta[k] = content[pos : pos + ln]
            pos += ln
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    want = [f["name"] for f in AVRO_SCHEMA["fields"]]
    got = [f["name"] for f in schema.get("fields", [])]
    if got != want:
        raise ValueError(f"unexpected schema fields {got} (want {want})")
    if pos + 16 > len(content):
        raise ValueError("truncated header sync")
    sync = content[pos : pos + 16]
    pos += 16
    out: list[tuple[int, str, str]] = []
    while pos < len(content):
        count, pos = _zigzag_decode(content, pos)
        size, pos = _zigzag_decode(content, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(content):
            raise ValueError("truncated block")
        payload = content[pos : pos + size]
        pos += size
        if content[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt or split block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        bp = 0
        for _ in range(count):
            doc_id, bp = _zigzag_decode(payload, bp)
            lang, bp = _dec_str(payload, bp)
            text, bp = _dec_str(payload, bp)
            out.append((doc_id, lang, text))
        if bp != len(payload):
            raise ValueError(f"{len(payload) - bp} undecoded bytes in block")
    return out


def write_avro_dir(
    df: DataFrame, out_dir: str, codec: str = "deflate"
) -> int:
    """Distributed Avro sink: every partition writes its own container
    file (part-{partitionId}.avro) — the connector part-file layout.
    The name is DETERMINISTIC per partition and the write goes through
    a task-unique temp file + atomic rename, so a retried or
    speculative task overwrites its own partition's container instead
    of leaving a second decodable file that would double-count the
    partition's records on read. Returns total records written (read
    back from the returned counts)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches):
        import uuid

        from pyspark import TaskContext

        rows: list[tuple[int, str, str]] = []
        for pdf in batches:
            rows += list(
                zip(pdf["doc_id"].astype(int), pdf["lang"], pdf["text"])
            )
        part_id = TaskContext.get().partitionId()
        name = f"part-{part_id:05d}.avro"
        # hidden + non-.avro: invisible to read_avro_dir's glob even if
        # a crashed attempt strands it
        tmp = os.path.join(
            out_dir, f".part-{part_id:05d}-{uuid.uuid4().hex[:8]}.tmp"
        )
        n = write_avro(tmp, rows, codec=codec, sync_name=name)
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n": [n]})

    parts = df.select("doc_id", "lang", "text").mapInPandas(
        write_part, schema="file string, n long"
    )
    return sum(r["n"] for r in parts.collect())


def read_avro_dir(spark: SparkSession, in_dir: str) -> DataFrame:
    """Distributed Avro source: list containers via the binaryFile
    source, decode each in an Arrow batch. (Fixture-scale whole-file
    decode; the per-block sync markers make large files splittable for
    a seeking reader.)"""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "*.avro")
    )

    def decode(batches):
        for pdf in batches:
            ids: list[int] = []
            langs: list[str] = []
            texts: list[str] = []
            for content in pdf["content"]:
                for doc_id, lang, text in read_avro(bytes(content)):
                    ids.append(doc_id)
                    langs.append(lang)
                    texts.append(text)
            yield pd.DataFrame({"doc_id": ids, "lang": langs, "text": texts})

    return files.select("content").mapInPandas(
        decode, schema="doc_id long, lang string, text string"
    )


# --- splittable range reader ------------------------------------------------
# The whole-file reader above is the fixture-scale path; this is the
# cluster-scale one — the actual Hadoop/Avro split algorithm over the
# sync markers the writer already emits, so one multi-GB container
# fans out across tasks instead of pinning one. Contract (the
# DataFileReader.sync/pastSync rule): a split [start, end) first scans
# FORWARD from `start` for the 16-byte sync marker (a marker
# straddling `start` is invisible — it belongs to the previous split's
# scan), then decodes every block whose start offset is < end + 16;
# the +16 slack is what makes a block whose sync straddles `end`
# belong to exactly one split (no gaps, no double-reads — fuzzed over
# split sizes in tests/test_avro_source.py).

_SYNC_LEN = 16


def _file_varint(f) -> int:
    """Zigzag varint read directly off a file handle."""
    shift = 0
    acc = 0
    while True:
        b = f.read(1)
        if not b:
            raise ValueError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1)


def _read_header_from_file(f) -> tuple[str, bytes, int]:
    """Parse the container header off an open file: returns
    (codec, sync marker, first block start offset)."""
    if f.read(4) != _MAGIC:
        raise ValueError("not an Avro container")
    meta: dict[str, bytes] = {}
    while True:
        n = _file_varint(f)
        if n == 0:
            break
        if n < 0:
            raise ValueError("negative metadata map block count unsupported")
        for _ in range(n):
            klen = _file_varint(f)
            k = f.read(klen).decode("utf-8")
            vlen = _file_varint(f)
            v = f.read(vlen)
            if len(v) != vlen:
                raise ValueError("truncated metadata value")
            meta[k] = v
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    want = [fld["name"] for fld in AVRO_SCHEMA["fields"]]
    got = [fld["name"] for fld in schema.get("fields", [])]
    if got != want:
        raise ValueError(f"unexpected schema fields {got} (want {want})")
    sync = f.read(_SYNC_LEN)
    if len(sync) != _SYNC_LEN:
        raise ValueError("truncated header sync")
    return codec, sync, f.tell()


def _scan_sync(f, sync: bytes, from_pos: int) -> int | None:
    """First block-start offset at or after ``from_pos``: scan forward
    for the sync marker (chunked, straddle-safe) and return the
    position just past it; None if no marker remains."""
    chunk_size = 1 << 16
    f.seek(from_pos)
    buf = b""
    base = from_pos
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            return None
        buf += chunk
        i = buf.find(sync)
        if i != -1:
            return base + i + _SYNC_LEN
        if len(buf) > _SYNC_LEN - 1:
            base += len(buf) - (_SYNC_LEN - 1)
            buf = buf[-(_SYNC_LEN - 1):]


def _decode_split(path: str, start: int, end: int) -> list[tuple[int, str, str]]:
    """Decode the blocks a split [start, end) owns (module-level so the
    fuzz test can drive it directly)."""
    out: list[tuple[int, str, str]] = []
    with open(path, "rb") as f:
        codec, sync, first_block = _read_header_from_file(f)
        file_size = os.fstat(f.fileno()).st_size
        if start == 0:
            block_start = first_block
        else:
            found = _scan_sync(f, sync, start)
            if found is None:
                return out
            block_start = found
        while block_start < min(end + _SYNC_LEN, file_size):
            f.seek(block_start)
            count = _file_varint(f)
            size = _file_varint(f)
            if count < 0 or size < 0:
                raise ValueError("corrupt block lengths")
            payload = f.read(size)
            if len(payload) != size or f.read(_SYNC_LEN) != sync:
                raise ValueError("truncated block or sync mismatch")
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            bp = 0
            for _ in range(count):
                doc_id, bp = _zigzag_decode(payload, bp)
                lang, bp = _dec_str(payload, bp)
                text, bp = _dec_str(payload, bp)
                out.append((doc_id, lang, text))
            if bp != len(payload):
                raise ValueError(f"{len(payload) - bp} undecoded bytes in block")
            block_start = f.tell()
    return out


def read_avro_dir_split(
    spark: SparkSession, in_dir: str, split_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed SPLITTABLE Avro source: the driver lists containers
    and cuts byte-range splits (catalog-style metadata work — no data
    reads); each task seeks into its range, syncs forward to a block
    boundary, and decodes only its blocks. Rows are identical to
    read_avro_dir's at any split size; with split_bytes below the file
    size a single large container genuinely fans out across tasks."""
    import glob as _glob

    import pandas as pd

    splits: list[tuple[str, int, int]] = []
    for path in sorted(_glob.glob(os.path.join(in_dir, "*.avro"))):
        size = os.path.getsize(path)
        for off in range(0, max(size, 1), split_bytes):
            splits.append((path, off, min(off + split_bytes, size)))

    def decode(batches):
        for pdf in batches:
            ids: list[int] = []
            langs: list[str] = []
            texts: list[str] = []
            for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                for doc_id, lang, text in _decode_split(path, int(start), int(end)):
                    ids.append(doc_id)
                    langs.append(lang)
                    texts.append(text)
            yield pd.DataFrame({"doc_id": ids, "lang": langs, "text": texts})

    nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sdf = spark.createDataFrame(splits, "path string, start long, end long")
    return sdf.repartition(min(len(splits), nshuf) or 1).mapInPandas(
        decode, schema="doc_id long, lang string, text string"
    )


# --- registered round-trip query -------------------------------------------

_AVRO_WRITTEN: dict[tuple[str, str], str] = {}


def src_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF ingest: derive the shared escaping-probe corpus
    (textfiles._derived — ONE derivation for every src_ round-trip),
    write it through the distributed container sink (deflate codec,
    one container per partition, atomic deterministic names), read it
    back through the binaryFile + mapInPandas decoder, and profile per
    language. The oracle is the shared profile SQL over the derivation,
    so a green hash proves the zigzag-varint / UTF-8 / raw-DEFLATE
    encode → decode path is byte-lossless — like ORC, there is no text
    escaping layer to hide behind. Distinct plan shape from the other
    src_ queries: binaryFile scan → Arrow-batched whole-container
    decode (the layout stays splittable at scale via the per-block
    sync markers the writer emits).

    Reference tie: the ingestion family around tasks/spider.go:21-74 —
    Avro is the columnar-world analogue of its xlsx container."""
    import tempfile

    from task_hive_spark.sources.textfiles import _derived, _profile
    from task_hive_spark.streaming.lifecycle import _scratch_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _AVRO_WRITTEN:
        out = tempfile.mkdtemp(prefix="ingest_avro_", dir=_scratch_root())
        write_avro_dir(_derived(spark, sf_dir), out, codec="deflate")
        _AVRO_WRITTEN[key] = out
    return _profile(read_avro_dir(spark, _AVRO_WRITTEN[key]))


QUERIES = {"src_avro_roundtrip": src_avro_roundtrip}


def _oracles() -> dict[str, str]:
    from task_hive_spark.sources.textfiles import _PROFILE_SQL

    return {"src_avro_roundtrip": _PROFILE_SQL}


ORACLES = _oracles()
