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

Real Common Crawl archives are ``.warc.gz``: a concatenation of RFC 1952
gzip MEMBERS, one record per member (ISO 28500 Annex C — member boundaries
are what make records seekable without inflating the file).
:func:`iter_warc_records` accepts both framings transparently;
:func:`iter_gzip_members` / :func:`gzip_member` are the member walk and its
writer half (header parse + raw-DEFLATE via stdlib ``zlib``, the same
inflate the PNG IDAT path uses — no new dependency).

Used from Spark via Arrow-batched ``mapInPandas`` (``queries/html.py::
doc_warc_extract``): Python does ONLY the container walk; all text
processing stays JVM-side column expressions. At 100 TB the walk is
embarrassingly parallel per archive blob — no state spans records, so
archives split across partitions freely.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

_CRLF = b"\r\n"

GZIP_MAGIC = b"\x1f\x8b"

# RFC 1952 FLG bits
_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield the decompressed bytes of each RFC 1952 gzip member in ``data``.

    Common Crawl ships ``.warc.gz`` as MEMBER-PER-RECORD concatenation (ISO
    28500 Annex C): record boundaries are member boundaries, which is what
    lets a reader seek to a record without inflating the whole file. This
    walker parses the member header by hand (magic, CM=8, the four optional
    FLG fields), inflates the raw-DEFLATE body (``zlib`` with negative
    wbits — the same stdlib inflate the PNG IDAT path uses), and verifies
    the CRC32 + ISIZE trailer per member. Raises ``ValueError`` on bad
    magic, an unsupported compression method, a truncated header/trailer,
    or a CRC/length mismatch.

    The DEFLATE body is fed in bounded memoryview slices: the obvious
    ``inf.decompress(data[pos:])`` per member copies the whole remaining
    blob (and ``unused_data`` copies it again), which is O(members x
    blob_size) memcpy — measured as a multi-minute stall per 256 MiB range
    task at the >2 GiB-shard regime (~16 GiB of copying per task). This
    form is O(blob_size) with ≤ ``_FEED``-sized copies.
    """
    mv = memoryview(data)
    pos = 0
    n = len(data)
    _FEED = 1 << 20
    while pos < n:
        if data[pos : pos + 2] != GZIP_MAGIC:
            raise ValueError(f"bad gzip magic at byte {pos}")
        if pos + 10 > n:
            raise ValueError("truncated gzip member header")
        cm, flg = data[pos + 2], data[pos + 3]
        if cm != 8:
            raise ValueError(f"unsupported gzip compression method {cm}")
        pos += 10  # magic(2) CM(1) FLG(1) MTIME(4) XFL(1) OS(1)
        if flg & _FEXTRA:
            if pos + 2 > n:
                raise ValueError("truncated gzip FEXTRA length")
            (xlen,) = struct.unpack_from("<H", data, pos)
            pos += 2 + xlen
        if flg & _FNAME:
            end = data.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated gzip FNAME")
            pos = end + 1
        if flg & _FCOMMENT:
            end = data.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated gzip FCOMMENT")
            pos = end + 1
        if flg & _FHCRC:
            pos += 2
        if pos > n:
            raise ValueError("truncated gzip member header fields")
        inf = zlib.decompressobj(-zlib.MAX_WBITS)
        chunks = []
        while True:
            if pos >= n:
                raise ValueError("truncated DEFLATE stream in gzip member")
            fed = mv[pos : pos + _FEED]
            try:
                piece = inf.decompress(fed)
            except zlib.error as exc:
                raise ValueError(
                    f"bad DEFLATE stream at byte {pos}: {exc}"
                ) from None
            if piece:
                chunks.append(piece)
            if inf.eof:
                pos += len(fed) - len(inf.unused_data)
                break
            pos += len(fed)
        out = b"".join(chunks)
        if pos + 8 > n:
            raise ValueError("truncated gzip member trailer")
        crc, isize = struct.unpack_from("<II", data, pos)
        if zlib.crc32(out) & 0xFFFFFFFF != crc:
            raise ValueError("gzip member CRC32 mismatch")
        if len(out) % (1 << 32) != isize:
            raise ValueError("gzip member ISIZE mismatch")
        yield out
        pos += 8


def iter_gzip_member_spans(fileobj, chunk_size: int = 1 << 20) -> Iterator[tuple[int, int]]:
    """Yield ``(offset, length)`` byte spans of each RFC 1952 member in an
    open binary STREAM — without ever materializing the file: headers parse
    from a sliding buffer, the raw-DEFLATE body is scanned incrementally
    (decompressed bytes are CRC'd and discarded in ≤4 MiB slices, so memory
    is bounded by ``chunk_size`` + the inflate window), and the CRC32+ISIZE
    trailer is verified per member, same contract as
    :func:`iter_gzip_members`.

    This is the cdx-style index builder for shards past the 2 GiB
    byte-array ceiling (Spark's ``binaryFile`` content column, JVM arrays):
    one streaming pass records where every member lives, after which any
    member-aligned byte range of the shard is independently parseable —
    the property ISO 28500 Annex C's member-per-record framing exists to
    provide. See ``sources/warcfiles.py::warc_member_index`` /
    ``read_warc_documents_chunked`` for the Spark composition.
    """
    buf = b""
    base = 0  # absolute file offset of buf[0]
    input_eof = False

    def _fill(need: int | None = None) -> None:
        """Grow buf to ``need`` bytes (or by one chunk when need is None)."""
        nonlocal buf, input_eof
        while not input_eof and (need is None or len(buf) < need):
            chunk = fileobj.read(chunk_size)
            if not chunk:
                input_eof = True
                break
            buf += chunk
            if need is None:
                break

    def _need(n: int, what: str) -> None:
        _fill(n)
        if len(buf) < n:
            raise ValueError(f"truncated gzip {what} at byte {base + len(buf)}")

    def _find_nul(start: int, what: str) -> int:
        while True:
            end = buf.find(b"\x00", start)
            if end >= 0:
                return end
            if input_eof:
                raise ValueError(f"unterminated gzip {what}")
            _fill(len(buf) + 1)

    _fill()
    while buf or not input_eof:
        if not buf:
            _fill()
            if not buf:
                break
        start_abs = base
        _need(10, "member header")
        if buf[:2] != GZIP_MAGIC:
            raise ValueError(f"bad gzip magic at byte {base}")
        cm, flg = buf[2], buf[3]
        if cm != 8:
            raise ValueError(f"unsupported gzip compression method {cm}")
        pos = 10
        if flg & _FEXTRA:
            _need(pos + 2, "FEXTRA length")
            (xlen,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            _need(pos + xlen, "FEXTRA field")
            pos += xlen
        if flg & _FNAME:
            pos = _find_nul(pos, "FNAME") + 1
        if flg & _FCOMMENT:
            pos = _find_nul(pos, "FCOMMENT") + 1
        if flg & _FHCRC:
            _need(pos + 2, "FHCRC field")
            pos += 2
        buf = buf[pos:]
        base += pos

        inf = zlib.decompressobj(-zlib.MAX_WBITS)
        crc = 0
        isize = 0
        while True:
            if not buf:
                _fill()
                if not buf:
                    raise ValueError("truncated DEFLATE stream in gzip member")
            data = buf
            fed = data
            while True:
                try:
                    out = inf.decompress(fed, 1 << 22)
                except zlib.error as exc:
                    raise ValueError(
                        f"bad DEFLATE stream at byte {base}: {exc}"
                    ) from None
                if out:
                    crc = zlib.crc32(out, crc)
                    isize += len(out)
                if inf.eof or not inf.unconsumed_tail:
                    break
                fed = inf.unconsumed_tail
            if inf.eof:
                consumed = len(data) - len(inf.unused_data)
                base += consumed
                buf = data[consumed:]
                break
            base += len(data)
            buf = b""
        _need(8, "member trailer")
        crc_t, isize_t = struct.unpack_from("<II", buf, 0)
        if crc & 0xFFFFFFFF != crc_t:
            raise ValueError("gzip member CRC32 mismatch")
        if isize % (1 << 32) != isize_t:
            raise ValueError("gzip member ISIZE mismatch")
        buf = buf[8:]
        base += 8
        yield (start_abs, base - start_abs)


def gzip_member(payload: bytes) -> bytes:
    """One minimal RFC 1952 member framing ``payload`` — handwritten header
    (no flags, zero MTIME, XFL=0, OS=255 'unknown'), raw-DEFLATE body,
    CRC32+ISIZE trailer. The writer half of :func:`iter_gzip_members`;
    stdlib ``gzip`` reads its output and vice versa (pinned in tests)."""
    comp = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = comp.compress(payload) + comp.flush()
    return (
        GZIP_MAGIC
        + b"\x08\x00\x00\x00\x00\x00\x00\xff"
        + body
        + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload) % (1 << 32))
    )


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"version", "headers", "payload"}`` per record in ``data``,
    accepting BOTH framings transparently: plain concatenated records, or
    gzip members (``.warc.gz``) each holding one-or-more records.

    ``headers`` keys are lower-cased. Raises ``ValueError`` on a malformed
    stream: bad magic, unterminated header block, missing/invalid
    Content-Length, or a payload truncated mid-record. Records may not span
    gzip member boundaries (per ISO 28500 Annex C they never do).
    """
    if data[:2] == GZIP_MAGIC:
        for member in iter_gzip_members(data):
            yield from _iter_plain_records(member)
        return
    yield from _iter_plain_records(data)


def _iter_plain_records(data: bytes) -> Iterator[dict]:
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
