"""Wire-format codec tests (S2/S3): snappy block format and prompb
protobuf, plus the full decode→flatten ingest path on a DataFrame of raw
POST bodies — the byte-level twin of the reference's hot path
(kinesis.go:69-90)."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_remote_kinesis_spark.sources.prompb import (
    _write_uvarint,
    encode_remote_write_body,
    encode_write_request,
    parse_write_request,
    snappy_compress_literal,
    snappy_decompress,
)
from prometheus_remote_kinesis_spark.sources.remote_write import decode_remote_write


@given(st.binary(max_size=200_000))
@settings(max_examples=50, deadline=None)
def test_snappy_literal_roundtrip(data):
    assert snappy_decompress(snappy_compress_literal(data)) == data


def test_snappy_copy_elements():
    """Decoder handles back-references (incl. overlapping copies), which
    real snappy encoders emit. Hand-built: 'abcd' literal + copy1
    (len 8, offset 4) → 'abcd' repeated with overlap → 'abcdabcdabcd'."""
    literal = bytes([3 << 2]) + b"abcd"  # literal, len 4
    copy1 = bytes([((8 - 4) << 2) | 1 | (0 << 5), 4])  # len 8, offset 4
    blob = bytes([12]) + literal + copy1  # 12 = decompressed length
    assert snappy_decompress(blob) == b"abcdabcdabcd"


def test_snappy_rejects_bad_offset():
    blob = bytes([4]) + bytes([(4 << 2) | 1 | (0 << 5), 200])
    with pytest.raises(ValueError):
        snappy_decompress(blob)


def _encode_copy(kind: int, length: int, offset: int) -> bytes:
    """Emit one back-reference element in the requested tag format
    (format_description.txt §2: copy1 len 4-11 / off <2048, copy2 len
    1-64 / off <65536, copy4 len 1-64 / off <2^32)."""
    if kind == 1:
        return bytes([((length - 4) << 2) | 1 | ((offset >> 8) << 5), offset & 0xFF])
    if kind == 2:
        return bytes([((length - 1) << 2) | 2]) + offset.to_bytes(2, "little")
    return bytes([((length - 1) << 2) | 3]) + offset.to_bytes(4, "little")


@given(st.data())
@settings(max_examples=200, deadline=None)
def test_snappy_fuzz_copy_literal_mix(data):
    """Property fuzz over the FULL element grammar: random interleavings
    of literals and all three copy tag formats (including overlapping
    copies, offset < length) are built alongside the output they imply,
    and the decoder must reproduce that output exactly. Closes the gap
    between the literal-only round-trip test and the hand-built copy
    cases — the decoder runs executor-side on every ingested body, so a
    100 TB replay hits every element shape a conformant encoder emits."""
    expected = bytearray()
    body = bytearray()
    n_ops = data.draw(st.integers(min_value=1, max_value=12))
    for _ in range(n_ops):
        if not expected or data.draw(st.booleans()):
            lit = data.draw(st.binary(min_size=1, max_size=300))
            ln = len(lit) - 1
            if ln < 60:
                body.append(ln << 2)
            else:
                nbytes = (ln.bit_length() + 7) // 8
                body.append((59 + nbytes) << 2)
                body += ln.to_bytes(nbytes, "little")
            body += lit
            expected += lit
        else:
            kind = data.draw(st.sampled_from([1, 2, 3]))
            max_off = min(len(expected), 2047 if kind == 1 else 65535)
            offset = data.draw(st.integers(min_value=1, max_value=max_off))
            length = data.draw(
                st.integers(min_value=4 if kind == 1 else 1, max_value=11 if kind == 1 else 64)
            )
            body += _encode_copy(kind, length, offset)
            start = len(expected) - offset
            for i in range(length):  # overlapping-copy semantics
                expected.append(expected[start + i])
    blob = bytes(_write_uvarint(len(expected))) + bytes(body)
    assert snappy_decompress(blob) == bytes(expected)


def test_protobuf_roundtrip():
    ts = [
        ({"__name__": "up", "job": "node"}, [(1.0, 1513264725773), (0.5, -7)]),
        ({"__name__": "empty"}, []),
        ({"метрика": "значение"}, [(float("nan"), 0)]),
    ]
    parsed = parse_write_request(encode_write_request(ts))
    assert len(parsed) == 3
    assert parsed[0]["labels"] == [
        {"name": "__name__", "value": "up"},
        {"name": "job", "value": "node"},
    ]
    assert parsed[0]["samples"][0] == {"value": 1.0, "timestamp": 1513264725773}
    assert parsed[0]["samples"][1]["timestamp"] == -7  # negative int64 varint
    assert parsed[1]["samples"] == []
    assert math.isnan(parsed[2]["samples"][0]["value"])


def test_protobuf_skips_unknown_fields():
    """Forward compatibility: prompb gained fields (exemplars=3,
    histograms=4 in TimeSeries) that v1-era parsers must skip."""
    body = encode_write_request([({"__name__": "m"}, [(2.0, 9)])])
    # splice an unknown varint field (field 9, wire 0) into WriteRequest
    extra = bytes([(9 << 3) | 0, 42])
    parsed = parse_write_request(body + extra)
    assert parsed[0]["samples"] == [{"value": 2.0, "timestamp": 9}]


def test_decode_remote_write_end_to_end(spark):
    """Raw snappy+protobuf bodies → records, matching the reference's
    flatten/NaN/empty-series semantics exactly (one pipeline: decode via
    mapInPandas, then the same declarative flatten as every other path)."""
    body1 = encode_remote_write_body(
        [
            ({"__name__": "up", "job": "n"}, [(1.0, 1000), (float("nan"), 2000)]),
            ({"__name__": "lonely"}, []),
        ]
    )
    body2 = encode_remote_write_body([({"no_name": "x"}, [(3.5, 5)])])
    df = spark.createDataFrame([(body1,), (body2,)], "body binary")
    rows = sorted(
        (
            (r["name"], r["time"], r["value"], dict(r["labels"]))
            for r in decode_remote_write(df).collect()
        ),
        key=lambda t: (t[0], t[1]),
    )
    assert rows == [
        ("", 5, 3.5, {"no_name": "x"}),
        ("lonely", 0, None, {"__name__": "lonely"}),
        ("up", 1000, 1.0, {"__name__": "up", "job": "n"}),
        ("up", 2000, None, {"__name__": "up", "job": "n"}),  # NaN→NULL
    ]


@given(
    st.lists(
        st.tuples(
            st.dictionaries(
                st.text(min_size=0, max_size=150),  # >127-byte names hit the
                st.text(min_size=0, max_size=150),  # general-path fallback
                max_size=4,
            ),
            st.lists(
                st.tuples(
                    st.floats(allow_nan=False, allow_infinity=True, width=64),
                    st.integers(min_value=-(2**63), max_value=2**63 - 1),
                ),
                max_size=4,
            ),
        ),
        max_size=6,
    )
)
@settings(max_examples=100, deadline=None)
def test_prompb_parse_fuzz_roundtrip(ts):
    """Property fuzz for the r5 fast-path parser: encode∘parse is the
    identity over arbitrary label strings (including >127-byte values,
    which overflow the single-byte-length fast path and must fall back to
    the general submessage parse), full-range int64 timestamps (negative
    → 10-byte varints), ±inf values, and empty series. Guards the
    fast/fallback boundary — the exact seam where an off-by-one would
    silently corrupt records."""
    body = encode_write_request(ts)
    parsed = parse_write_request(body)
    assert len(parsed) == len(ts)
    for (labels, samples), got in zip(ts, parsed):
        assert got["labels"] == [
            {"name": n, "value": v} for n, v in labels.items()
        ]
        assert got["samples"] == [
            {"value": v, "timestamp": t} for v, t in samples
        ]


def test_parse_malformed_wire_matches_slice_bounded_semantics():
    """r5 code-review repro: the fast-path parser must not read past a
    declared submessage span nor accept varints the general path rejects.

    (a) A Label whose inner name length claims bytes beyond the label
    span: the slice-bounded general parse truncates the name at the span
    (here 'ab'); the fast path must yield the same, never bleeding bytes
    from the following submessage.
    (b) A Sample whose timestamp varint is 11 bytes (>64-bit): the
    general path raises ValueError('uvarint too long'); the fast path
    must defer to it, not silently accept a >int64 value."""
    import pytest

    # (a) TimeSeries = Label(span 4: 0x0A 0x06 'ab' — name claims 6 bytes)
    #     followed by a valid Sample
    label = bytes([0x0A, 0x06]) + b"ab"
    sample = bytes([0x09]) + struct.pack("<d", 2.0) + bytes([0x10, 0x09])
    ts_msg = bytes([0x0A, len(label)]) + label + bytes([0x12, len(sample)]) + sample
    body = bytes([0x0A, len(ts_msg)]) + ts_msg
    parsed = parse_write_request(body)
    assert parsed[0]["labels"] == [{"name": "ab", "value": ""}]
    assert parsed[0]["samples"] == [{"value": 2.0, "timestamp": 9}]

    # (b) overlong (11-byte) timestamp varint → ValueError, same as the
    #     pre-fast-path parser
    bad_sample = bytes([0x09]) + struct.pack("<d", 1.0) + bytes([0x10]) + b"\x80" * 10 + b"\x01"
    ts_msg2 = bytes([0x12, len(bad_sample)]) + bad_sample
    body2 = bytes([0x0A, len(ts_msg2)]) + ts_msg2
    with pytest.raises(ValueError, match="uvarint too long"):
        parse_write_request(body2)
