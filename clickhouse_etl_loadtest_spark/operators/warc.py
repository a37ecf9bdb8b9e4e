"""Minimal WARC (Web ARChive, ISO 28500) record walker — dependency-free,
in the house style of the RIFF/PNG/GIF chunk walkers in
``operators/codecs.py`` (no reference counterpart: the reference pipeline
has no web-archive stage; WARC is what Common-Crawl-style corpora ship in,
and walking records out of it is the step before HTML→text extraction —
``functions/html.py``).

A WARC file is a concatenation of records::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: http://...\\r\\n
    Content-Length: N\\r\\n
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

Payload framing is LENGTH-DELIMITED (Content-Length), never sentinel-based:
a payload containing the literal text ``WARC/1.0`` must not confuse the
walker (pinned in tests). ``response`` payloads carry the HTTP message;
:func:`http_body` strips the status line + headers to the entity body.

Used from Spark via Arrow-batched ``mapInPandas`` (``queries/html.py::
doc_warc_extract``): Python does ONLY the container walk; all text
processing stays JVM-side column expressions. At 100 TB the walk is
embarrassingly parallel per archive blob — no state spans records, so
archives split across partitions freely.
"""

from __future__ import annotations

from typing import Iterator

_CRLF = b"\r\n"


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"version", "headers", "payload"}`` per record in ``data``.

    ``headers`` keys are lower-cased. Raises ``ValueError`` on a malformed
    stream: bad magic, unterminated header block, missing/invalid
    Content-Length, or a payload truncated mid-record.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding (the spec's two CRLFs, or more)
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC version line at byte {pos}")
        version = data[pos + 5 : eol].decode("ascii", "replace")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            if eol == pos:  # empty line: end of headers
                pos += 2
                break
            line = data[pos:eol]
            sep = line.find(b":")
            if sep < 0:
                raise ValueError(f"malformed WARC header line: {line!r}")
            headers[line[:sep].decode("ascii", "replace").strip().lower()] = (
                line[sep + 1 :].decode("ascii", "replace").strip()
            )
            pos = eol + 2
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length") from None
        except ValueError:
            raise ValueError(
                f"invalid Content-Length: {headers['content-length']!r}"
            ) from None
        if pos + length > n:
            raise ValueError(
                f"truncated WARC payload: need {length} bytes at {pos}, have {n - pos}"
            )
        yield {
            "version": version,
            "headers": headers,
            "payload": data[pos : pos + length],
        }
        pos += length


def http_body(payload: bytes) -> bytes:
    """Entity body of an HTTP message payload (``response``/``request``
    records): everything after the first blank line. Payloads that do not
    start with ``HTTP/`` pass through unchanged."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    return payload if sep < 0 else payload[sep + 4 :]


def response_documents(data: bytes) -> Iterator[tuple[str, bytes]]:
    """(target-uri, html-bytes) for every ``response`` record in ``data`` —
    the WET-generation step: non-response records (warcinfo, request,
    metadata) are skipped, HTTP headers stripped."""
    for rec in iter_warc_records(data):
        if rec["headers"].get("warc-type") == "response":
            yield rec["headers"].get("warc-target-uri", ""), http_body(rec["payload"])
