"""Property-based tests (hypothesis) for the round-13 wire-format
primitives: the flatbuffers-backed Arrow IPC codec (with pyarrow as
the cross-implementation judge), the FLAC Rice coder and coded-number
scheme, and the WARC record grammar. Pure-Python round trips — no
Spark jobs — so example counts can run high."""

from __future__ import annotations

import io

from hypothesis import given, settings, strategies as st

# Unicode-heavy but surrogate-free text (WARC/Arrow/FLAC all carry
# utf-8; lone surrogates are not encodable by design)
_TEXT = st.text(
    st.characters(blacklist_categories=("Cs",)), max_size=200
)
_LANG = st.text(
    st.sampled_from(list("abcdefghijklmnopqrstuvwxyz")), min_size=1, max_size=8
)
_RECS = st.lists(
    st.tuples(st.integers(min_value=-(2**63), max_value=2**63 - 1), _LANG, _TEXT),
    max_size=60,
)


@settings(max_examples=120, deadline=None)
@given(_RECS)
def test_arrow_stream_roundtrip_fuzz(recs):
    from task_hive_spark.sources.arrowipc import read_arrow_stream, write_arrow_stream

    assert read_arrow_stream(write_arrow_stream(recs)) == recs


@settings(max_examples=30, deadline=None)
@given(_RECS)
def test_arrow_file_pyarrow_cross_read_fuzz(recs):
    """Every fuzzed batch must ALSO satisfy the reference
    implementation — pyarrow judges the flatbuffers builder's output,
    including alignment and footer geometry, on arbitrary payloads."""
    import pyarrow as pa

    from task_hive_spark.sources.arrowipc import read_arrow_file, write_arrow_file

    raw = write_arrow_file(recs, batch_rows=16)
    assert read_arrow_file(raw) == recs
    tbl = pa.ipc.open_file(io.BytesIO(raw)).read_all()
    got = list(zip(*(tbl[c].to_pylist() for c in ("doc_id", "lang", "text"))))
    assert got == (recs if recs else [])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**30), max_value=2**30), min_size=0, max_size=64),
    st.integers(min_value=0, max_value=4),
)
def test_flac_rice_roundtrip_fuzz(residuals, order):
    """Partitioned-Rice write→read is the identity for any residual
    list — including outliers that force the escape branch — for every
    fixed-predictor order and a block size the partition rule accepts."""
    from task_hive_spark.operators.multimodal import (
        _FlacBitReader,
        _SiBitWriter,
        _rice_read,
        _rice_write,
    )

    block = len(residuals) + order
    if block == 0:
        return
    bw = _SiBitWriter()
    _rice_write(bw, residuals, order, block)
    while bw.nbits % 8:
        bw.put(0, 1)
    assert _rice_read(_FlacBitReader(bw.done()), order, block) == residuals


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 36) - 1))
def test_flac_coded_number_roundtrip_fuzz(n):
    from task_hive_spark.operators.multimodal import (
        _flac_utf8_code,
        _flac_utf8_decode,
    )

    enc = _flac_utf8_code(n)
    assert _flac_utf8_decode(enc, 0) == (n, len(enc))
    # canonical length: the shortest form is used (1 then 5k+1 bits)
    want_len = 1 if n < 0x80 else next(k for k in range(2, 8) if n < 1 << (5 * k + 1))
    assert len(enc) == want_len


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2**62), _LANG, _TEXT),
        max_size=12,
    )
)
def test_warc_record_roundtrip_fuzz(recs):
    """Record grammar + gzip members + HTTP layer + digests survive
    arbitrary unicode payloads (CRLF runs, header-lookalike text)."""
    import gzip

    from task_hive_spark.sources.warc import (
        encode_response_record,
        extract_doc,
        iter_warc_gz,
    )

    blob = b"".join(
        gzip.compress(encode_response_record(i, lang, text), mtime=0)
        for (i, lang, text) in recs
    )
    got = [extract_doc(r) for r in iter_warc_gz(blob)]
    assert got == [(i, lang, text) for (i, lang, text) in recs]
