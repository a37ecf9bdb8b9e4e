"""Unit tests for operators/warc.py — the container-walk edge cases the
oracle-level round-trip (``doc_warc_extract``) exercises only in aggregate:
length-delimited framing (payloads containing record magic), padding
tolerance, HTTP body stripping, and loud failures on malformed streams.
"""

from __future__ import annotations

import gzip as _stdlib_gzip
import struct
import zlib

import pytest

from clickhouse_etl_loadtest_spark.operators.warc import (
    gzip_member,
    http_body,
    iter_gzip_members,
    iter_warc_records,
    response_documents,
)


def _record(rec_type: str, payload: bytes, extra: dict | None = None) -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    for k, v in (extra or {}).items():
        head.append(f"{k}: {v}".encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_single_record_roundtrip():
    data = _record("resource", b"hello world")
    (rec,) = iter_warc_records(data)
    assert rec["version"] == "1.0"
    assert rec["headers"]["warc-type"] == "resource"
    assert rec["payload"] == b"hello world"


def test_multi_record_and_header_case_insensitivity():
    data = _record("warcinfo", b"software: x") + _record(
        "response", b"<p>hi</p>", {"WARC-TARGET-URI": "http://a/b"}
    )
    recs = list(iter_warc_records(data))
    assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["headers"]["warc-target-uri"] == "http://a/b"


def test_payload_containing_record_magic_is_not_resplit():
    """Framing is Content-Length, never sentinel scanning: a payload that
    contains a full fake record must come back intact as ONE record."""
    evil = b"before\r\n" + _record("response", b"inner") + b"after"
    data = _record("resource", evil)
    (rec,) = iter_warc_records(data)
    assert rec["payload"] == evil


def test_extra_interrecord_padding_tolerated():
    data = _record("resource", b"a") + b"\r\n\r\n\r\n" + _record("resource", b"b")
    assert [r["payload"] for r in iter_warc_records(data)] == [b"a", b"b"]


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"NOTWARC/1.0\r\n\r\n", "bad WARC version line"),
        (b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n", "missing Content-Length"),
        (
            b"WARC/1.0\r\nContent-Length: ten\r\n\r\n",
            "invalid Content-Length",
        ),
        (
            b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort",
            "truncated WARC payload",
        ),
        (b"WARC/1.0\r\nContent-Length 5\r\n\r\nabcde", "malformed WARC header"),
        (b"WARC/1.0\r\nContent-Length: 5", "unterminated WARC header"),
    ],
)
def test_malformed_streams_fail_loud(data, msg):
    with pytest.raises(ValueError, match=msg):
        list(iter_warc_records(data))


def test_http_body_strips_headers_only_for_http_payloads():
    assert http_body(b"HTTP/1.1 200 OK\r\nA: b\r\n\r\n<p>x</p>") == b"<p>x</p>"
    # body itself may contain blank lines — only the FIRST terminator splits
    assert http_body(b"HTTP/1.1 200 OK\r\n\r\na\r\n\r\nb") == b"a\r\n\r\nb"
    assert http_body(b"not http") == b"not http"
    assert http_body(b"HTTP/1.1 200 OK no terminator") == b"HTTP/1.1 200 OK no terminator"


# --- gzip member framing (.warc.gz, RFC 1952 + ISO 28500 Annex C) -------------------


def _gz_records(*recs: bytes) -> bytes:
    """Member-per-record framing, the real Common Crawl shape."""
    return b"".join(gzip_member(r) for r in recs)


def test_gz_framing_yields_same_records_as_plain():
    recs = [
        _record("warcinfo", b"software: x"),
        _record("request", b"GET / HTTP/1.1\r\n\r\n", {"WARC-Target-URI": "http://u"}),
        _record(
            "response",
            b"HTTP/1.1 200 OK\r\n\r\n<p>one</p>",
            {"WARC-Target-URI": "http://u"},
        ),
    ]
    plain = list(iter_warc_records(b"".join(recs)))
    gz = list(iter_warc_records(_gz_records(*recs)))
    assert gz == plain
    assert list(response_documents(_gz_records(*recs))) == [
        ("http://u", b"<p>one</p>")
    ]


def test_gz_member_payload_containing_gzip_magic_is_not_resplit():
    """Member boundaries come from the DEFLATE stream end + trailer, never
    from scanning for magic: a payload embedding a whole gzip member (and
    the bare magic) must round-trip intact."""
    evil = b"\x1f\x8b" + gzip_member(b"inner member") + b"\x1f\x8b tail"
    data = _gz_records(_record("resource", evil), _record("resource", b"after"))
    recs = list(iter_warc_records(data))
    assert [r["payload"] for r in recs] == [evil, b"after"]


def test_gz_stdlib_interop_both_directions():
    rec = _record("resource", b"payload bytes")
    # stdlib-written members parse (gzip.compress sets MTIME; GzipFile adds FNAME)
    import io

    buf = io.BytesIO()
    with _stdlib_gzip.GzipFile(
        filename="rec-0.warc", fileobj=buf, mode="wb"
    ) as f:
        f.write(rec)
    stdlib_member = buf.getvalue()
    assert [m for m in iter_gzip_members(stdlib_member)] == [rec]
    assert [r["payload"] for r in iter_warc_records(stdlib_member)] == [
        b"payload bytes"
    ]
    # our members are readable by stdlib gzip (multi-member concatenation too)
    assert _stdlib_gzip.decompress(_gz_records(rec, rec)) == rec + rec


def test_gz_optional_header_fields_are_skipped():
    """FEXTRA + FNAME + FCOMMENT + FHCRC, all present at once."""
    payload = _record("resource", b"x")
    comp = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = comp.compress(payload) + comp.flush()
    hdr = b"\x1f\x8b\x08" + bytes([1 | 2 | 4 | 8 | 16]) + b"\x00\x00\x00\x00\x00\xff"
    extra = struct.pack("<H", 6) + b"AB\x02\x00xy"  # XLEN=6, one subfield
    member = (
        hdr
        + extra
        + b"name.warc\x00"
        + b"a comment\x00"
        + b"\x00\x00"  # FHCRC (value unchecked, skipped)
        + body
        + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
    )
    assert list(iter_gzip_members(member)) == [payload]


def test_gz_one_member_holding_multiple_records_tolerated():
    """Annex C says one record per member; a multi-record member must still
    walk (records may not SPAN members, but may share one)."""
    two = _record("resource", b"a") + _record("resource", b"b")
    assert [r["payload"] for r in iter_warc_records(gzip_member(two))] == [b"a", b"b"]


def test_gz_record_spanning_members_fails_loud():
    rec = _record("resource", b"0123456789")
    data = gzip_member(rec[:20]) + gzip_member(rec[20:])
    with pytest.raises(ValueError):
        list(iter_warc_records(data))


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda m: b"XX" + m[2:], "bad gzip magic"),
        (lambda m: m[:2] + b"\x07" + m[3:], "unsupported gzip compression"),
        (lambda m: m[:9], "truncated gzip member header"),
        (lambda m: m[:-8] + struct.pack("<II", 0, 0)[:8][:4] + m[-4:], "CRC32 mismatch"),
        (lambda m: m[:-4] + struct.pack("<I", 999), "ISIZE mismatch"),
        (lambda m: m[:-10], "truncated"),
        (lambda m: m[:12], "DEFLATE stream"),
    ],
)
def test_gz_malformed_members_fail_loud(mutate, msg):
    member = gzip_member(_record("resource", b"hello"))
    with pytest.raises(ValueError, match=msg):
        list(iter_gzip_members(mutate(member)))


def test_gz_fuzz_roundtrip_vs_stdlib():
    """Random binary payloads (naturally containing gzip magic, nulls, CRLF
    soup) must round-trip member-per-payload, and stdlib gzip must agree on
    the whole concatenation — the writer and walker are honest inverses."""
    import random

    rng = random.Random(1234)
    for _ in range(50):
        payloads = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
            for _ in range(rng.randrange(1, 6))
        ]
        blob = b"".join(gzip_member(p) for p in payloads)
        assert list(iter_gzip_members(blob)) == payloads
        assert _stdlib_gzip.decompress(blob) == b"".join(payloads)


def test_response_documents_skips_non_responses():
    data = (
        _record("warcinfo", b"software: x")
        + _record("request", b"GET / HTTP/1.1\r\n\r\n", {"WARC-Target-URI": "http://u"})
        + _record(
            "response",
            b"HTTP/1.1 200 OK\r\n\r\n<p>one two three</p>",
            {"WARC-Target-URI": "http://u"},
        )
    )
    assert list(response_documents(data)) == [("http://u", b"<p>one two three</p>")]


def test_gz_member_spans_stream_exact_extents_tiny_chunks():
    """iter_gzip_member_spans must report byte-exact (offset, length) spans
    from a STREAM, under a pathologically small read chunk (7 bytes, so
    every header field and the trailer straddle fills), including a member
    with every optional header field and a stdlib-gzip member."""
    import io

    from clickhouse_etl_loadtest_spark.operators.warc import (
        iter_gzip_member_spans,
    )

    payloads = [_record("resource", b"alpha"), _record("resource", b"b" * 300)]
    members = [gzip_member(p) for p in payloads]
    # one flagged member (FEXTRA+FNAME+FCOMMENT+FHCRC)
    fp = _record("resource", b"flagged")
    comp = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = comp.compress(fp) + comp.flush()
    flagged = (
        b"\x1f\x8b\x08" + bytes([1 | 2 | 4 | 8 | 16]) + b"\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6) + b"AB\x02\x00xy"
        + b"name.warc\x00" + b"a comment\x00" + b"\x00\x00"
        + body
        + struct.pack("<II", zlib.crc32(fp) & 0xFFFFFFFF, len(fp))
    )
    members.append(flagged)
    import gzip as _stdlib_gzip

    members.append(_stdlib_gzip.compress(_record("resource", b"stdlib")))
    blob = b"".join(members)
    expected, off = [], 0
    for m in members:
        expected.append((off, len(m)))
        off += len(m)
    got = list(iter_gzip_member_spans(io.BytesIO(blob), chunk_size=7))
    assert got == expected
    # spans really are independently parseable slices
    for (o, ln), p in zip(got[:2], payloads):
        assert list(iter_gzip_members(blob[o : o + ln])) == [p]


def test_gz_member_spans_truncated_and_corrupt_fail_loud():
    import io

    from clickhouse_etl_loadtest_spark.operators.warc import (
        iter_gzip_member_spans,
    )

    member = gzip_member(_record("resource", b"x"))
    with pytest.raises(ValueError, match="trailer"):
        list(iter_gzip_member_spans(io.BytesIO(member[:-3])))
    bad = bytearray(member)
    bad[-10] ^= 0xFF  # flip a byte inside CRC region
    with pytest.raises(ValueError, match="CRC32|DEFLATE"):
        list(iter_gzip_member_spans(io.BytesIO(bytes(bad))))
    with pytest.raises(ValueError, match="magic"):
        list(iter_gzip_member_spans(io.BytesIO(b"not gzip at all")))
