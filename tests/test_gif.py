"""GIF codec (operators/gif.py): LZW property tests (random, repetitive
KwKwK, dictionary-reset lengths), paletted exact round-trips, color-cube
bounds, animation frames, interlaced decode against a hand-built stream,
extension skipping, import-gated PIL cross-validation, and the Spark
ingestion/fingerprint path."""

import struct

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import real_decode, sniff_format
from clickhouse_etl_loadtest_spark.operators.gif import (
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    resize_gif,
)


# --- LZW ----------------------------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 7, 255, 300, 511, 512, 5000, 40000])
def test_lzw_roundtrip_random(n):
    seq = np.random.default_rng(n).integers(0, 256, size=n).tolist()
    assert _lzw_decode(_lzw_encode(seq, 8), 8) == seq


def test_lzw_roundtrip_repetitive_kwkwk():
    # heavy repetition exercises the code==next_code (KwKwK) branch and a
    # full-table reset; small alphabets exercise small min code sizes
    seq = ([1, 2, 3] * 4000) + [5] * 3000 + [1, 1, 2, 1, 1, 2, 1, 1]
    assert _lzw_decode(_lzw_encode(seq, 8), 8) == seq
    small = [0, 1, 0, 0, 1, 1, 0, 1] * 200
    assert _lzw_decode(_lzw_encode(small, 2), 2) == small


# --- container ----------------------------------------------------------------


def test_paletted_exact_roundtrip():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, size=(20, 30)).astype(np.int64)
    d = decode_gif(encode_gif(idx, palette=pal))
    assert (d["width"], d["height"], d["n_frames"]) == (30, 20, 1)
    assert (d["frames"][0]["pixels"] == pal[idx]).all()


def test_rgb_cube_quantization_bound():
    px = np.random.default_rng(3).integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    out = decode_gif(encode_gif(px))["frames"][0]["pixels"]
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 25
    # exact on-cube colors survive exactly
    exact = (np.random.default_rng(4).integers(0, 6, size=(8, 8, 3)) * 51).astype(np.uint8)
    assert (decode_gif(encode_gif(exact))["frames"][0]["pixels"] == exact).all()


def test_animated_frames():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    f1 = rng.integers(0, 256, size=(10, 10)).astype(np.int64)
    f2 = rng.integers(0, 256, size=(10, 10)).astype(np.int64)
    d = decode_gif(encode_gif(f1, palette=pal, loop_frames=[f2]))
    assert d["n_frames"] == 2
    assert (d["frames"][0]["pixels"] == pal[f1]).all()
    assert (d["frames"][1]["pixels"] == pal[f2]).all()


def test_interlaced_decode_restores_row_order():
    """Hand-build an interlaced stream: rows stored in 4-pass order with the
    interlace flag set must come back in natural order."""
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, size=(13, 6)).astype(np.int64)
    h, w = idx.shape
    pass_order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    stored = idx[pass_order]  # rows as an interlaced encoder would store them
    base = encode_gif(stored, palette=pal)
    # image descriptor sits right after header(6) + LSD(7) + GCT(768);
    # searching for 0x2C would false-hit random palette bytes
    i = 6 + 7 + 768
    patched = bytearray(base)
    assert patched[i] == 0x2C and patched[i + 9] == 0
    patched[i + 9] = 0x40
    d = decode_gif(bytes(patched))
    assert (d["frames"][0]["pixels"] == pal[idx]).all()


def test_extension_blocks_skipped():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, size=(5, 5)).astype(np.int64)
    base = encode_gif(idx, palette=pal)
    # splice a graphic control extension before the image descriptor
    i = 6 + 7 + 768
    assert base[i] == 0x2C
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    patched = base[:i] + gce + base[i:]
    d = decode_gif(patched)
    assert (d["frames"][0]["pixels"] == pal[idx]).all()


def test_malformed_rejected_and_degrades():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7)  # valid LSD, no image blocks
    truncated = encode_gif(np.zeros((8, 8, 3), dtype=np.uint8))[:20]
    assert real_decode(truncated)["format"] == "raw"


def test_resize_and_dispatch():
    px = (np.random.default_rng(8).integers(0, 6, size=(24, 24, 3)) * 51).astype(np.uint8)
    g = encode_gif(px)
    assert sniff_format(g) == "gif"
    d = real_decode(g)
    assert (d["format"], d["width"], d["height"], d["n_samples"]) == ("gif", 24, 24, 1)
    r = decode_gif(resize_gif(g, 6, 4))
    assert (r["width"], r["height"]) == (6, 4)


def test_pil_cross_validation():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = (np.random.default_rng(9).integers(0, 6, size=(12, 10, 3)) * 51).astype(np.uint8)
    # our encoder -> PIL decoder (on-cube colors: exact)
    img = PIL.open(io.BytesIO(encode_gif(px))).convert("RGB")
    assert (np.asarray(img) == px).all()
    # PIL encoder -> our decoder
    buf = io.BytesIO()
    PIL.fromarray(px).save(buf, format="GIF")
    assert (decode_gif(buf.getvalue())["frames"][0]["pixels"] == px).all()


def test_gif_through_media_ingestion_and_ahash(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        decode_media_typed,
        media_ahash,
        read_media_dir,
    )

    # on-cube pixels: the GIF re-encode is lossless, so the cross-format
    # fingerprint must be IDENTICAL to the PPM's
    y, x = np.mgrid[0:16, 0:16]
    px = ((np.stack([x % 6, y % 6, (x + y) % 6], axis=-1)) * 51).astype(np.uint8)
    (tmp_path / "img.gif").write_bytes(encode_gif(px))
    media = read_media_dir(spark, str(tmp_path))
    r = decode_media_typed(media).collect()[0]
    assert (r["kind"], r["format"], r["width"], r["height"]) == ("image", "gif", 16, 16)

    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px))), (2, bytearray(encode_gif(px)))],
        schema="media_id long, data binary",
    )
    hashes = {row["media_id"]: row["ahash"] for row in media_ahash(df).collect()}
    assert hashes[1] is not None and hashes[1] == hashes[2]


# --- hypothesis property tests --------------------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    seq=st.lists(st.integers(0, 255), min_size=0, max_size=2000),
    min_code=st.integers(2, 8),
)
def test_lzw_roundtrip_property(seq, min_code):
    """Any index stream within the alphabet must survive encode->decode,
    at any legal minimum code size."""
    seq = [s % (1 << min_code) for s in seq]
    assert _lzw_decode(_lzw_encode(seq, min_code), min_code) == seq
