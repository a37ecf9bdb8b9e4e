"""PNG codec (operators/codecs.py): round-trips for every supported color
type, all five row filters decoded against an INDEPENDENT forward-filter
implementation written here from the spec (RFC 2083 §6), CRC/variant
rejection with graceful real_decode fallback, and the end-to-end path from
a real .png file on disk through read_media_dir -> typed decode."""

import struct
import zlib

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    real_decode,
    real_resize,
    resize_png,
    sniff_format,
)


def _rng():
    return np.random.default_rng(11)


# --- round trips --------------------------------------------------------------


@pytest.mark.parametrize("shape", [(9, 7), (9, 7, 3), (9, 7, 4)])
def test_roundtrip_color_types(shape):
    px = _rng().integers(0, 256, size=shape).astype(np.uint8)
    d = decode_png(encode_png(px))
    exp = px[:, :, None] if px.ndim == 2 else px
    assert d["format"] == "png"
    assert (d["width"], d["height"]) == (7, 9)
    assert d["n_channels"] == exp.shape[2]
    assert (d["pixels"] == exp).all()


# --- the five filters, forward-filtered independently -------------------------


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forward_filter(pixels, ftypes):
    """Spec-faithful forward filtering (the encoder side our codec does NOT
    implement beyond filter 0) — decoding its output is a genuine inverse
    test, not implementation mirroring."""
    h, w, ch = pixels.shape
    rows = pixels.reshape(h, w * ch).astype(int)
    out = b""
    for y, ftype in enumerate(ftypes):
        cur = rows[y]
        prev = rows[y - 1] if y > 0 else np.zeros(w * ch, dtype=int)
        filt = []
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                v = cur[x]
            elif ftype == 1:
                v = cur[x] - a
            elif ftype == 2:
                v = cur[x] - b
            elif ftype == 3:
                v = cur[x] - ((a + b) // 2)
            else:
                v = cur[x] - _paeth(a, b, c)
            filt.append(v & 0xFF)
        out += bytes([ftype]) + bytes(filt)
    return out


def _chunk(ctype, payload):
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _png_with_filters(pixels, ftypes):
    h, w, ch = pixels.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _forward_filter(pixels, ftypes)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_all_five_filters_decode(ch):
    px = _rng().integers(0, 256, size=(5, 6, ch)).astype(np.uint8)
    data = _png_with_filters(px, ftypes=[0, 1, 2, 3, 4])
    assert (decode_png(data)["pixels"] == px).all()


def test_idat_split_across_chunks_decodes():
    px = _rng().integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    whole = zlib.compress(_forward_filter(px, [4, 3, 2, 1]))
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", whole[:7])
        + _chunk(b"IDAT", whole[7:])
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data)["pixels"] == px).all()


# --- rejection + graceful fallback -------------------------------------------


def test_crc_mismatch_rejected_and_falls_back_to_raw():
    px = _rng().integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    data = bytearray(encode_png(px))
    data[40] ^= 0xFF  # flip a byte inside the IDAT payload -> its CRC no longer matches
    data = bytes(data)
    with pytest.raises(ValueError):
        decode_png(data)
    out = real_decode(data)
    assert out["format"] == "raw" and out["n_bytes"] == len(data)


def test_unsupported_variants_rejected():
    # 16-bit depth
    bad_depth = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad_depth)
    # Adam7 interlace
    interlaced = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(interlaced)


def test_pixel_length_mismatch_rejected():
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


# --- resize + dispatch --------------------------------------------------------


def test_resize_preserves_format_and_bounds():
    px = _rng().integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    data = encode_png(px)
    out = real_resize(data, target_bytes=64)
    d = decode_png(out)
    assert d["format"] == "png" and d["n_channels"] == 3
    assert d["width"] * d["height"] * 3 <= 64
    small = resize_png(data, 4, 2)
    assert (decode_png(small)["width"], decode_png(small)["height"]) == (4, 2)


def test_sniff_dispatch():
    px = _rng().integers(0, 256, size=(2, 2, 3)).astype(np.uint8)
    assert sniff_format(encode_png(px)) == "png"
    d = real_decode(encode_png(px))
    assert (d["format"], d["width"], d["height"], d["n_channels"]) == ("png", 2, 2, 3)


def test_pil_cross_validation():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _rng().integers(0, 256, size=(6, 5, 3)).astype(np.uint8)
    # our encoder -> PIL decoder
    img = PIL.open(io.BytesIO(encode_png(px)))
    assert (np.asarray(img) == px).all()
    # PIL encoder -> our decoder
    buf = io.BytesIO()
    PIL.fromarray(px).save(buf, format="PNG")
    assert (decode_png(buf.getvalue())["pixels"] == px).all()


# --- end-to-end: real file on disk through the Spark ingestion path -----------


def test_png_file_through_media_ingestion(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        decode_media_typed,
        read_media_dir,
    )

    px = _rng().integers(0, 256, size=(10, 8, 3)).astype(np.uint8)
    (tmp_path / "img.png").write_bytes(encode_png(px))
    media = read_media_dir(spark, str(tmp_path))
    rows = decode_media_typed(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["kind"] == "image" and r["format"] == "png"
    assert (r["width"], r["height"]) == (8, 10)


def test_ppm_and_png_of_same_pixels_hash_identically(spark):
    from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm
    from clickhouse_etl_loadtest_spark.operators.multimodal import media_ahash

    px = _rng().integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px))), (2, bytearray(encode_png(px)))],
        schema="media_id long, data binary",
    )
    hashes = {r["media_id"]: r["ahash"] for r in media_ahash(df).collect()}
    assert hashes[1] is not None
    assert hashes[1] == hashes[2]  # one fingerprint contract across formats


# --- hypothesis property tests --------------------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_filtered_roundtrip_property(data):
    """Random pixels, shape, channel count AND per-row filter choices: the
    unfilter must invert the spec's forward filter exactly."""
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    ch = data.draw(st.sampled_from([1, 3, 4]))
    seed = data.draw(st.integers(0, 2**16))
    ftypes = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch)).astype(np.uint8)
    assert (decode_png(_png_with_filters(px, ftypes))["pixels"] == px).all()
