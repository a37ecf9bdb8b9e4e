"""Unit tests for operators/warc.py — the container-walk edge cases the
oracle-level round-trip (``doc_warc_extract``) exercises only in aggregate:
length-delimited framing (payloads containing record magic), padding
tolerance, HTTP body stripping, and loud failures on malformed streams.
"""

from __future__ import annotations

import pytest

from clickhouse_etl_loadtest_spark.operators.warc import (
    http_body,
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
