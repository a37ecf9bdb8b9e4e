"""Dependency-free baseline JPEG codec (ITU-T T.81): SOF0, 8-bit,
grayscale or YCbCr 4:4:4, standard Annex K quantization and Huffman tables.

Scope is deliberately the interchange baseline: the encoder writes 4:4:4
with the spec's example tables (what every decoder must accept), and the
decoder handles exactly what it declares — sequential DCT, one scan,
non-subsampled — rejecting progressive/subsampled/12-bit streams with a
ValueError so the multimodal stages degrade to byte stats instead of
mis-rendering. The DCT is the orthonormal 8x8 matrix form (pure numpy);
entropy coding is the spec's category + magnitude-bits scheme with 0xFF00
byte stuffing.

Called from Arrow batches inside ``mapInPandas`` like the WAV/PPM/PNG
codecs — one Python roundtrip per batch, never per row.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# --- Annex K example tables ----------------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3: (BITS counts per code length 1..16, HUFFVAL symbol list)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II matrix: coef = T @ block @ T.T, block = T.T @ coef @ T
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _k in range(1, 8):
    for _j in range(8):
        _T[_k, _j] = 0.5 * np.cos((2 * _j + 1) * _k * np.pi / 16.0)


def _huff_codes(bits, vals):
    """Canonical Huffman code assignment (T.81 Annex C): symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _huff_decoder(bits, vals):
    """(code, length) -> symbol map for decoding."""
    return {cl: sym for sym, cl in _huff_codes(bits, vals).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_value(self, v: int) -> None:
        s = _category(v)
        if s:
            self.write(v if v > 0 else v + (1 << s) - 1, s)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        # un-stuff 0xFF00 -> 0xFF; a 0xFF followed by anything else is a marker
        buf = bytearray()
        i = 0
        while i < len(data):
            b = data[i]
            buf.append(b)
            if b == 0xFF:
                if i + 1 < len(data) and data[i + 1] == 0x00:
                    i += 1  # skip the stuffed zero
                else:
                    buf.pop()  # marker reached: stop
                    break
            i += 1
        self.data = bytes(buf)
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    return np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _encode_block(bw: _BitWriter, block: np.ndarray, qt, dc_tab, ac_tab, prev_dc: int) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns the new DC."""
    coef = _T @ (block - 128.0) @ _T.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    bw.write(*dc_tab[s])
    bw.write_value(diff)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_tab[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        bw.write(*ac_tab[(run << 4) | s])
        bw.write_value(v)
        run = 0
    if last_nz < 63:
        bw.write(*ac_tab[0x00])  # EOB
    return int(zz[0])


def _pad_to(p: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")


def encode_jpeg(pixels: np.ndarray, subsampling: str = "444") -> bytes:
    """Baseline JPEG writer: (h, w) grayscale or (h, w, 3) RGB uint8,
    Annex K tables, single interleaved scan. ``subsampling``: "444"
    (non-subsampled) or "420" (2x2-mean chroma, the camera/encoder default
    in the wild)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        hv = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., c] for c in range(3)]
        if subsampling == "420":
            hv = [(2, 2), (1, 1), (1, 1)]
            for c in (1, 2):  # 2x2-mean chroma downsample on an even-padded plane
                p = _pad_to(planes[c], h + (h & 1), w + (w & 1))
                planes[c] = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        else:
            hv = [(1, 1)] * 3
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    ncomp = len(planes)
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA])
    dc_tabs = [_huff_codes(*_DC_LUMA)] + ([] if gray else [_huff_codes(*_DC_CHROMA)])
    ac_tabs = [_huff_codes(*_AC_LUMA)] + ([] if gray else [_huff_codes(*_AC_CHROMA)])

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, qt in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(int(x) for x in qt.reshape(-1)[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(ncomp):
        sof += bytes([cid + 1, (hv[cid][0] << 4) | hv[cid][1], 0 if cid == 0 else 1])
    out += _seg(0xC0, sof)
    for tabs, spec in [((_DC_LUMA, _DC_CHROMA), 0), ((_AC_LUMA, _AC_CHROMA), 1)]:
        for th in range(1 if gray else 2):
            bits, vals = tabs[th]
            out += _seg(0xC4, bytes([(spec << 4) | th] + bits + vals))
    sos = bytes([ncomp])
    for cid in range(ncomp):
        t = 0 if cid == 0 else 1
        sos += bytes([cid + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_to(planes[c], mcuy * 8 * hv[c][1], mcux * 8 * hv[c][0]) for c in range(ncomp)
    ]
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(ncomp):
                ch, cv = hv[c]
                qt = qts[min(c, len(qts) - 1)]
                dc_t, ac_t = dc_tabs[min(c, 1)], ac_tabs[min(c, 1)]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        prev_dc[c] = _encode_block(
                            bw, padded[c][y0 : y0 + 8, x0 : x0 + 8], qt, dc_t, ac_t, prev_dc[c]
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> dict:
    """Baseline JPEG parser: sequential DCT (SOF0), 8-bit, sampling factors
    1-2 per axis (grayscale, 4:4:4, 4:2:0, 4:2:2/4:4:0). Progressive,
    12-bit, DRI or exotic-sampling streams raise ValueError (the multimodal
    stage then degrades to byte stats)."""
    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps = []
    scan_comps = []
    entropy_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # standard-legal padding: any number of 0xFF fill bytes may precede a
        # marker (ITU-T T.81 B.1.1.2); skip them instead of reading 0xFF as a
        # marker id and the next two bytes as a bogus segment length
        while data[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(data):
                raise ValueError("truncated JPEG marker")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: no payload
            pos += 2
            continue
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals (DRI) unsupported")
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hvb, tq = payload[6 + 3 * c : 9 + 3 * c]
                ch, cv = hvb >> 4, hvb & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(f"sampling factors {ch}x{cv} unsupported (1-2 only)")
                comps.append((cid, tq, ch, cv))
            sof = (h, w, ncomp)
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if sof is None or entropy_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, ncomp = sof
    for _cid, tq, _ch, _cv in comps:
        if tq not in qts:
            raise ValueError(f"scan references undefined quant table {tq}")
    for _cid, td, ta in scan_comps:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(f"scan references undefined Huffman tables dc={td} ac={ta}")
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data[entropy_start:])
    planes = [
        np.zeros((mcuy * 8 * comps[c][3], mcux * 8 * comps[c][2])) for c in range(ncomp)
    ]
    prev_dc = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(ncomp):
                _cid, td, ta = scan_comps[c]
                _id, tq, ch, cv = comps[c]
                qt = qts[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.huff(huff[(0, td)])
                        diff = _extend(br.bits(s), s) if s else 0
                        prev_dc[c] += diff
                        zz[0] = prev_dc[c]
                        k = 1
                        while k < 64:
                            sym = br.huff(huff[(1, ta)])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k >= 64:
                                raise ValueError("AC run overflows block")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * qt.reshape(-1)[_ZIGZAG]
                        block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[c][y0 : y0 + 8, x0 : x0 + 8] = block
    full = []
    for c in range(ncomp):
        _id, _tq, ch, cv = comps[c]
        p = planes[c]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])
    if ncomp == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    elif ncomp == 3:
        px = np.clip(np.round(_ycbcr_to_rgb(np.stack(full, axis=-1))), 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unsupported component count {ncomp}")
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "n_channels": px.shape[2],
        "pixels": px,
    }


def resize_jpeg(data: bytes, target_w: int, target_h: int) -> bytes:
    """Decode -> nearest-neighbor -> re-encode (lossy, like any JPEG resize)."""
    d = decode_jpeg(data)
    px = d["pixels"]
    h, w = px.shape[:2]
    yi = (np.arange(target_h) * (h / target_h)).astype(np.int64)
    xi = (np.arange(target_w) * (w / target_w)).astype(np.int64)
    out = px[yi][:, xi]
    return encode_jpeg(out[:, :, 0] if d["n_channels"] == 1 else out)


# --- MJPEG-in-AVI: the minimal real video container ---------------------------------

# RIFF('AVI ') with an hdrl header list and a movi list of '00dc' chunks,
# each chunk one complete baseline JPEG — the oldest, simplest real video
# format there is, and the one a dependency-free frame sampler can honestly
# support end-to-end (every sampled frame decodes with decode_jpeg above).
AVI_MAGIC_PREFIX = b"RIFF"
AVI_FOURCC = b"AVI "


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """Write an MJPEG AVI: ``frames`` is a list of (h, w[, 3]) uint8 arrays,
    all the same shape; each becomes one '00dc' chunk holding a full
    baseline JPEG."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    jpegs = [encode_jpeg(np.asarray(f, dtype=np.uint8)) for f in frames]
    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max(len(j) for j in jpegs) * fps,
        0,
        0x10,  # AVIF_HASINDEX off, AVIF_WASCAPTUREFILE-ish flags kept minimal
        len(jpegs),
        0,
        1,  # one stream
        max(len(j) for j in jpegs),
        w,
        h,
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), max(len(j) for j in jpegs), 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4I2i", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)  # 'MJPG'
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih) + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", j) for j in jpegs))
    body = AVI_FOURCC + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> dict:
    """Parse an MJPEG AVI: header metadata + the list of per-frame JPEG
    payloads (NOT decoded — callers pick frames, then ``decode_jpeg``)."""
    if data[:4] != b"RIFF" or data[8:12] != AVI_FOURCC:
        raise ValueError("not a RIFF/AVI payload")
    width = height = n_frames = 0
    fps = 0.0
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, n_frames, fps
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + size]
            if fourcc == b"LIST":
                walk(body[4:])  # skip the list type, recurse into children
            elif fourcc == b"avih":
                vals = struct.unpack("<10I", body[:40])
                n_frames = vals[4]
                width, height = vals[8], vals[9]
                fps = 1_000_000.0 / vals[0] if vals[0] else 0.0
            elif fourcc.endswith(b"dc"):
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if not frames:
        raise ValueError("AVI contains no video frames")
    return {
        "format": "avi",
        "width": width,
        "height": height,
        "n_frames": n_frames or len(frames),
        "fps": fps,
        "duration_ms": int(round(len(frames) * 1000.0 / fps)) if fps else None,
        "frames": frames,
    }
