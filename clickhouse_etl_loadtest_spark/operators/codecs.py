"""Dependency-free real media codecs: PCM16 WAV (RIFF), binary PPM (P6),
8-bit non-interlaced PNG (zlib is stdlib) and baseline JPEG (operators/jpeg.py,
re-exported here for the dispatch).

The multimodal stages (operators/multimodal.py) default to a deterministic
byte-level fake because this environment ships no media libraries; these
formats need nothing beyond ``struct``/``zlib``/numpy, so the decode /
resize stages exercise GENUINE binary formats end-to-end (chunk walks, CRC
checks, inflate + the five PNG row filters, format-aware resample) while
PIL/librosa/ffmpeg stay import-gated for the rest.

All functions are plain bytes -> dict/bytes transforms, called from Arrow
batches inside ``mapInPandas`` — one Python roundtrip per batch, never per
row (same execution contract as the fake path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .gif import GIF_MAGIC, decode_gif, encode_gif, resize_gif  # noqa: F401
from .jpeg import (  # noqa: F401 (re-export)
    JPEG_MAGIC,
    decode_avi,
    decode_jpeg,
    encode_avi_mjpeg,
    resize_jpeg,
)

WAV_MAGIC = b"RIFF"
PPM_MAGIC = b"P6"


# --- WAV (PCM16 mono/stereo) --------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM16, (n,) mono or (n, ch) interleaved."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16),
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    return hdr + data


def decode_wav(data: bytes) -> dict:
    """Parse RIFF chunks; returns format metadata + the sample array.

    Walks the chunk list (not fixed offsets) so files with extra chunks
    (LIST/INFO) parse correctly — the part a naive 44-byte-header reader
    gets wrong."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or ch < 1:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits}, channels={ch})")
    samples = np.frombuffer(raw[: (len(raw) // (2 * ch)) * 2 * ch], dtype="<i2").reshape(-1, ch)
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "n_channels": ch,
        "bit_depth": bits,
        "n_samples": samples.shape[0],
        "duration_ms": int(samples.shape[0] * 1000 / sample_rate) if sample_rate else 0,
        "samples": samples,
    }


def resize_wav(data: bytes, target_samples: int) -> bytes:
    """Resample by stride selection (nearest-neighbor in time): keeps the
    format valid — the output decodes with the same parser."""
    d = decode_wav(data)
    s = d["samples"]
    n = s.shape[0]
    if n <= target_samples:
        return data
    idx = (np.arange(target_samples) * (n / target_samples)).astype(np.int64)
    return encode_wav(s[idx], sample_rate=d["sample_rate"])


# --- PPM (P6 binary RGB) ------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 writer: (h, w, 3) uint8."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "PPM is RGB"
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(data: bytes) -> dict:
    """P6 parser: whitespace-separated header tokens (with # comments), then
    raw RGB bytes."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    pixels = np.frombuffer(data[pos : pos + w * h * 3], dtype=np.uint8).reshape(h, w, 3)
    return {"format": "ppm", "width": w, "height": h, "maxval": maxval, "pixels": pixels}


def resize_ppm(data: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize; output is a valid P6 payload."""
    d = decode_ppm(data)
    px = d["pixels"]
    h, w = px.shape[:2]
    yi = (np.arange(target_h) * (h / target_h)).astype(np.int64)
    xi = (np.arange(target_w) * (w / target_w)).astype(np.int64)
    return encode_ppm(px[yi][:, xi])


# --- magic-byte dispatch (used by the mapInPandas stages) ---------------------


def sniff_format(data: bytes) -> str:
    if data[:4] == WAV_MAGIC:  # RIFF container: disambiguate by form type
        if data[8:12] == b"WAVE":
            return "wav"
        if data[8:12] == b"AVI ":
            return "avi"
        return "raw"
    if data[:2] == PPM_MAGIC:
        return "ppm"
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:3] == JPEG_MAGIC:
        return "jpeg"
    if data[:4] == GIF_MAGIC and data[4:6] in (b"7a", b"9a"):
        return "gif"
    return "raw"


# malformed-payload fallback: a magic-prefix match is a hint, not a guarantee
# (RIFF-but-not-WAVE, PCM24 WAV, text starting "P6x", truncated headers) — one
# bad row must degrade to byte stats, never kill the whole mapInPandas stage.
# KeyError is deliberately NOT caught: every data-driven dict lookup in the
# decoders (JPEG huff tables, GIF LZW codes) validates and raises ValueError,
# so a KeyError here would be a programming bug that should surface.
_DECODE_ERRORS = (ValueError, struct.error, ZeroDivisionError, IndexError, zlib.error)


def real_decode(data: bytes) -> dict:
    """Typed decode by magic bytes; raw AND malformed payloads fall back to
    byte stats (format="raw").

    Returns a uniform dict (missing fields None) so one mapInPandas schema
    covers all formats."""
    kind = sniff_format(data)
    out = {
        "format": "raw",
        "n_bytes": len(data),
        "sample_rate": None,
        "n_samples": None,
        "n_channels": None,
        "width": None,
        "height": None,
        "duration_ms": None,
    }
    try:
        if kind == "wav":
            d = decode_wav(data)
            out.update(
                format="wav",
                sample_rate=d["sample_rate"],
                n_samples=d["n_samples"],
                n_channels=d["n_channels"],
                duration_ms=d["duration_ms"],
            )
        elif kind == "ppm":
            d = decode_ppm(data)
            out.update(format="ppm", width=d["width"], height=d["height"])
        elif kind == "png":
            d = decode_png(data)
            out.update(
                format="png",
                width=d["width"],
                height=d["height"],
                n_channels=d["n_channels"],
            )
        elif kind == "jpeg":
            d = decode_jpeg(data)
            out.update(
                format="jpeg",
                width=d["width"],
                height=d["height"],
                n_channels=d["n_channels"],
            )
        elif kind == "gif":
            d = decode_gif(data)
            out.update(
                format="gif",
                width=d["width"],
                height=d["height"],
                n_channels=3,
                n_samples=d["n_frames"],  # frame count, like AVI
            )
        elif kind == "avi":
            d = decode_avi(data)
            # n_samples carries the frame count, sample_rate the fps —
            # one uniform decode schema across modalities
            out.update(
                format="avi",
                width=d["width"],
                height=d["height"],
                n_samples=d["n_frames"],
                sample_rate=int(d["fps"]) if d["fps"] else None,
                duration_ms=d["duration_ms"],
            )
    except _DECODE_ERRORS:
        pass  # keep the raw byte stats
    return out


def stride_sample(data: bytes, target_bytes: int) -> bytes:
    """Byte-level stride downsample to ``target_bytes`` — the single source of
    truth for the format-unaware resize path (shared by real_resize's fallback
    and operators/multimodal.resize_media; the multimodal_resize_frames DuckDB
    oracle replays this exact arithmetic)."""
    if len(data) <= target_bytes:
        return data
    arr = np.frombuffer(data, dtype=np.uint8)
    idx = (np.arange(target_bytes) * (len(data) / target_bytes)).astype(np.int64)
    return arr[idx].tobytes()


def real_resize(data: bytes, target_bytes: int = 256) -> bytes:
    """Format-aware resize: WAV resamples in time, PPM in space; raw and
    malformed payloads stride-sample bytes (the fake-path behavior). Always
    returns a payload that still decodes under the same format."""
    kind = sniff_format(data)
    try:
        if kind == "wav":
            d = decode_wav(data)
            per_sample = 2 * d["n_channels"]
            return resize_wav(data, max(1, (target_bytes - 44) // per_sample))
        if kind == "ppm":
            d = decode_ppm(data)
            side = max(1, int((target_bytes // 3) ** 0.5))
            if d["width"] * d["height"] <= side * side:
                return data
            return resize_ppm(data, min(side, d["width"]), min(side, d["height"]))
        if kind == "png":
            d = decode_png(data)
            # budget pixels by channel count; compressed size then lands
            # under target for natural images (filter-0 zlib)
            side = max(1, int((target_bytes // d["n_channels"]) ** 0.5))
            if d["width"] * d["height"] <= side * side:
                return data
            return resize_png(data, min(side, d["width"]), min(side, d["height"]))
        if kind == "jpeg":
            d = decode_jpeg(data)
            side = max(1, int((target_bytes // d["n_channels"]) ** 0.5))
            if d["width"] * d["height"] <= side * side:
                return data
            return resize_jpeg(data, min(side, d["width"]), min(side, d["height"]))
        if kind == "gif":
            d = decode_gif(data)
            side = max(1, int(target_bytes ** 0.5))  # 1 byte/px indexed
            if d["width"] * d["height"] <= side * side:
                return data
            return resize_gif(data, min(side, d["width"]), min(side, d["height"]))
    except _DECODE_ERRORS:
        pass  # malformed: fall through to byte-stride
    return stride_sample(data, target_bytes)


# --- PNG (8-bit gray/RGB/RGBA, non-interlaced) --------------------------------

# zlib is stdlib, so PNG needs no external dependency either: chunk walk,
# IDAT inflate, and the five per-row filters from the spec (RFC 2083 §6).
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer: (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA
    uint8, filter 0 (None) on every row, one IDAT."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the five PNG row filters (None/Sub/Up/Average/Paeth)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = row
        elif ftype == 1:  # Sub: left neighbor (sequential along the row)
            acc = row.copy()
            for x in range(ch, stride):
                acc[x] = (acc[x] + acc[x - ch]) & 0xFF
            out[y] = acc
        elif ftype == 2:  # Up
            out[y] = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            acc = row.copy()
            for x in range(stride):
                left = acc[x - ch] if x >= ch else 0
                acc[x] = (acc[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = acc
        elif ftype == 4:  # Paeth
            acc = row.copy()
            for x in range(stride):
                a = acc[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                acc[x] = (acc[x] + pred) & 0xFF
            out[y] = acc
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_png(data: bytes) -> dict:
    """Chunk-walking PNG parser: 8-bit gray/RGB/RGBA, non-interlaced, CRC
    checked on IHDR/IDAT; ancillary chunks skipped."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if ctype in (b"IHDR", b"IDAT"):
            (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
            if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG CRC mismatch in {ctype.decode('ascii')}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG variant (depth={depth}, color={color}, interlace={interlace})")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG pixel payload length mismatch")
    pixels = _png_unfilter(raw, w, h, ch)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": ch,
        "pixels": pixels,
    }


def resize_png(data: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize; output is a valid PNG of the same color type."""
    d = decode_png(data)
    px = d["pixels"]
    h, w = px.shape[:2]
    yi = (np.arange(target_h) * (h / target_h)).astype(np.int64)
    xi = (np.arange(target_w) * (w / target_w)).astype(np.int64)
    out = px[yi][:, xi]
    return encode_png(out[:, :, 0] if d["n_channels"] == 1 else out)


# --- audio spectrogram features ------------------------------------------------


def spectrogram_features(samples: np.ndarray, n_frames: int = 8, n_bands: int = 8) -> np.ndarray:
    """Log-power spectrogram embedding of a PCM sample array: mono mix ->
    ``n_frames`` equal time frames -> Hann window -> rFFT power ->
    ``n_bands`` equal frequency bands -> log -> per-feature mean removal.

    The mean removal makes the feature EXACTLY gain-invariant (a gain g
    multiplies power by g², adding a constant 2·log g to every log band,
    which the centering cancels) — same invariance contract as the aHash /
    audio-fingerprint stages, pinned in tests. Output is a fixed
    float32[n_frames * n_bands] vector regardless of clip length — directly
    usable by the embedding operators (ANN, near-dup, k-means) at DIM=64
    with the defaults."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    n = len(s)
    if n < n_frames:
        s = np.pad(s, (0, n_frames - n))
        n = len(s)
    frame_len = n // n_frames
    out = np.empty((n_frames, n_bands))
    window = np.hanning(frame_len) if frame_len > 1 else np.ones(frame_len)
    for i in range(n_frames):
        frame = s[i * frame_len : (i + 1) * frame_len] * window
        power = np.abs(np.fft.rfft(frame)) ** 2
        bands = np.array_split(power, n_bands)
        out[i] = [np.log(b.sum() + 1e-12) for b in bands]
    out -= out.mean()
    return out.reshape(-1).astype(np.float32)
