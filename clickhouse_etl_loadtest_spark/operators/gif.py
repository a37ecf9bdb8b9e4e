"""Dependency-free GIF codec (GIF87a/89a): variable-width LZW, global and
local color tables, Adam-style 4-pass interlacing, multi-frame (animated)
streams.

Scope: the decoder yields every image block as its own frame (indexed data
-> palette -> RGB) with its placement offsets; frame DISPOSAL/compositing is
deliberately not modeled — curation pipelines sample frames, they don't
replay animations. The encoder writes GIF89a from paletted input (exact
roundtrip) or from RGB via a deterministic 6x6x6 color-cube quantization
(lossy by ≤ 25/channel, like any GIF export of true-color data).

Same execution contract as the other codecs: plain bytes transforms called
from Arrow batches inside ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"

_MAX_CODE = 4096


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, clear/end codes, 12-bit cap."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    nbits = len(data) * 8
    while True:
        if bitpos + code_size > nbits:
            break
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            table = {i: [i] for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < _MAX_CODE:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode` — growth/reset rules mirror it exactly."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bits: list[int] = []
    state = {"code_size": min_code_size + 1}

    def emit(code: int) -> None:
        for i in range(state["code_size"]):
            bits.append((code >> i) & 1)

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w: tuple = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # the decoder's table lags ours by one entry (it adds on the
            # NEXT code it reads), so widen one step later than it does
            if next_code == (1 << state["code_size"]) + 1 and state["code_size"] < 12:
                state["code_size"] += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            state["code_size"] = min_code_size + 1
            next_code = end + 1
        w = (int(k),)
    if w:
        emit(table[w])
    emit(end)
    # pack LSB-first into bytes
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        out.append(byte)
    return bytes(out)


def _cube_palette() -> np.ndarray:
    """Deterministic 6x6x6 color cube (216 entries, padded to 256)."""
    levels = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)
    cube = np.array(
        [(r, g, b) for r in levels for g in levels for b in levels], dtype=np.uint8
    )
    return np.vstack([cube, np.zeros((256 - 216, 3), dtype=np.uint8)])


def encode_gif(
    pixels: np.ndarray, palette: np.ndarray | None = None, loop_frames: list | None = None
) -> bytes:
    """GIF89a writer. ``pixels``: (h, w) palette indices (with ``palette``
    (n≤256, 3) uint8 — exact roundtrip) or (h, w, 3) RGB uint8 (quantized to
    the 6x6x6 cube). ``loop_frames``: optional extra frames (same form) for
    an animated stream."""
    frames = [pixels] + list(loop_frames or [])
    if palette is None:
        palette = _cube_palette()
        levels = np.array([0, 51, 102, 153, 204, 255])

        def to_idx(f):
            f = np.asarray(f, dtype=np.int64)
            q = np.argmin(np.abs(f[..., None] - levels), axis=-1)
            return (q[..., 0] * 36 + q[..., 1] * 6 + q[..., 2]).astype(np.int64)

        idx_frames = [to_idx(f) for f in frames]
    else:
        palette = np.asarray(palette, dtype=np.uint8)
        if len(palette) < 256:
            palette = np.vstack([palette, np.zeros((256 - len(palette), 3), np.uint8)])
        idx_frames = [np.asarray(f, dtype=np.int64) for f in frames]
    h, w = idx_frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries, 8 bpp
    out += palette[:256].tobytes()
    min_code = 8
    for idx in idx_frames:
        fh, fw = idx.shape[:2]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)  # no LCT, no interlace
        out += bytes([min_code])
        payload = _lzw_encode(idx.reshape(-1).tolist(), min_code)
        for i in range(0, len(payload), 255):
            block = payload[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> dict:
    """Parse GIF87a/89a: every image block becomes a frame dict
    ``{left, top, width, height, pixels}`` with RGB uint8 pixels."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            payload += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decode(bytes(payload), min_code)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        arr = np.array(idx[: fw * fh], dtype=np.int64)
        if fpacked & 0x40:  # interlaced: reorder rows via the 4 passes
            rows = arr.reshape(fh, fw)
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    ordered[y] = rows[src]
                    src += 1
            arr = ordered.reshape(-1)
        if int(arr.max(initial=0)) >= len(ct):
            raise ValueError("GIF index exceeds color table")
        frames.append(
            {
                "left": left,
                "top": top,
                "width": fw,
                "height": fh,
                "pixels": ct[arr].reshape(fh, fw, 3),
            }
        )
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return {
        "format": "gif",
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "frames": frames,
    }


def resize_gif(data: bytes, target_w: int, target_h: int) -> bytes:
    """First-frame nearest-neighbor thumbnail, re-encoded via the color cube."""
    d = decode_gif(data)
    px = d["frames"][0]["pixels"]
    h, w = px.shape[:2]
    yi = (np.arange(target_h) * (h / target_h)).astype(np.int64)
    xi = (np.arange(target_w) * (w / target_w)).astype(np.int64)
    return encode_gif(px[yi][:, xi])
