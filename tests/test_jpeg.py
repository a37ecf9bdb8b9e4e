"""Baseline JPEG codec (operators/jpeg.py): exactness where the math is
exact (DC-only images), fidelity bounds where it is lossy, entropy-coding
edge paths (ZRL runs, byte stuffing), explicit rejection of the variants
outside the declared baseline scope, import-gated PIL cross-validation, and
the Spark ingestion/fingerprint integration."""

import struct

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import real_decode, sniff_format
from clickhouse_etl_loadtest_spark.operators.jpeg import (
    _T,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    resize_jpeg,
)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255.0**2 / mse) if mse else float("inf")


def test_uniform_images_reconstruct_exactly():
    for val in (0, 77, 128, 255):
        g = np.full((16, 24), val, dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(g))
        assert (d["width"], d["height"], d["n_channels"]) == (24, 16, 1)
        assert int(np.abs(d["pixels"][:, :, 0].astype(int) - val).max()) <= 1
    c = np.full((8, 8, 3), 200, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(c))
    assert int(np.abs(d["pixels"].astype(int) - 200).max()) <= 1


def test_smooth_gradient_fidelity():
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))["pixels"]
    assert _psnr(px, out) > 30.0


def test_420_roundtrip_fidelity_and_odd_sizes():
    """4:2:0 (the wild-JPEG default): chroma loss is bounded, luma detail
    survives, and odd dimensions crop correctly across 16x16 MCUs."""
    h, w = 33, 41
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 5) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(px, subsampling="420"))
    assert (d["width"], d["height"]) == (w, h)
    assert _psnr(px, d["pixels"]) > 30.0
    # 4:4:4 of the same image must beat 4:2:0 (chroma is really subsampled)
    full = decode_jpeg(encode_jpeg(px, subsampling="444"))["pixels"]
    assert _psnr(px, full) > _psnr(px, d["pixels"])


def test_odd_dimensions_pad_and_crop():
    px = np.random.default_rng(3).integers(0, 256, size=(13, 9, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(px))
    assert (d["width"], d["height"]) == (9, 13)


def test_zrl_long_zero_runs():
    """A single highest-frequency coefficient forces a 62-zero AC run —
    three ZRL symbols before the value; built by inverse-DCT of a chosen
    coefficient block so the path is hit deterministically."""
    coef = np.zeros((8, 8))
    coef[7, 7] = 400.0  # survives quantization (qt[7,7]=99 -> q=4)
    block = _T.T @ coef @ _T + 128.0
    px = np.clip(np.round(block), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))["pixels"][:, :, 0]
    assert _psnr(px, out) > 25.0
    # and the reconstructed block is NOT flat — the (7,7) energy survived
    assert out.std() > 5.0


def test_byte_stuffing_roundtrip():
    rng = np.random.default_rng(9)
    for _ in range(8):
        px = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
        data = encode_jpeg(px)
        if b"\xff\x00" in data[2:-2]:
            decode_jpeg(data)  # must not mistake stuffed FFs for markers
            return
    pytest.fail("no encode produced a stuffed 0xFF byte to exercise")


def test_rejects_out_of_scope_variants():
    base = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # progressive: rewrite SOF0 marker to SOF2
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    # exotic sampling: flip the component h/v byte to 3x3 (2x2 IS supported)
    i = base.index(b"\xff\xc0")
    sub = bytearray(base)
    sub[i + 11] = 0x33  # SOF0 payload: len(2) prec(1) h(2) w(2) n(1) id(1) -> hv
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(sub))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 10)


def test_fill_bytes_and_standalone_markers_are_skipped():
    """Standard-legal 0xFF fill bytes before a marker (ITU-T T.81 B.1.1.2)
    and zero-payload standalone markers (TEM, RSTn outside the entropy
    stream) must not be parsed as length-bearing segments — wild-caught
    JPEGs contain both (round-5 ADVICE)."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    base = encode_jpeg(px)
    ref = decode_jpeg(base)["pixels"]
    i = base.index(b"\xff\xc0")
    # three fill bytes + a standalone TEM before SOF0
    padded = base[:i] + b"\xff\xff\xff" + b"\xff\x01" + base[i:]
    got = decode_jpeg(padded)
    assert got["width"] == 8 and np.array_equal(got["pixels"], ref)
    # RST4 standalone in the header section is skipped the same way
    rst = base[:i] + b"\xff\xd4" + base[i:]
    assert np.array_equal(decode_jpeg(rst)["pixels"], ref)


def test_undefined_table_ids_degrade_not_crash():
    """A scan referencing a quant/Huffman table that was never defined must
    raise ValueError from decode_jpeg (not KeyError), and the mapInPandas
    dispatch must degrade the row to byte stats instead of dying."""
    base = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # excise the DQT segment entirely -> scan's quant table is undefined
    i = base.index(b"\xff\xdb")
    (dqt_len,) = struct.unpack(">H", base[i + 2 : i + 4])
    no_dqt = base[:i] + base[i + 2 + dqt_len :]
    with pytest.raises(ValueError, match="undefined quant"):
        decode_jpeg(no_dqt)
    assert real_decode(no_dqt)["format"] == "raw"
    # excise the first DHT segment -> scan's Huffman table is undefined
    j = base.index(b"\xff\xc4")
    (dht_len,) = struct.unpack(">H", base[j + 2 : j + 4])
    no_dht = base[:j] + base[j + 2 + dht_len :]
    with pytest.raises(ValueError, match="undefined Huffman"):
        decode_jpeg(no_dht)
    assert real_decode(no_dht)["format"] == "raw"


def test_truncated_stream_degrades_to_raw():
    px = np.random.default_rng(1).integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    data = encode_jpeg(px)[: len(encode_jpeg(px)) // 2]
    assert sniff_format(data) == "jpeg"
    out = real_decode(data)
    assert out["format"] in ("raw", "jpeg")  # malformed -> raw; a lucky cut may parse headers
    if out["format"] == "raw":
        assert out["n_bytes"] == len(data)


def test_resize_keeps_format():
    px = np.random.default_rng(2).integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    small = resize_jpeg(encode_jpeg(px), 8, 8)
    d = decode_jpeg(small)
    assert (d["width"], d["height"], d["format"]) == (8, 8, "jpeg")


def test_pil_cross_validation():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = np.random.default_rng(4).integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
    # our encoder -> PIL decoder: decoders may differ by IDCT rounding only
    for ss in ("444", "420"):
        ours = decode_jpeg(encode_jpeg(px, subsampling=ss))["pixels"]
        pil = np.asarray(PIL.open(io.BytesIO(encode_jpeg(px, subsampling=ss))))
        assert int(np.abs(ours.astype(int) - pil.astype(int)).max()) <= 2, ss
    # PIL encoder -> our decoder, both at its default 4:2:0 and at 4:4:4
    for sub in (0, 2):
        buf = io.BytesIO()
        PIL.fromarray(px).save(buf, format="JPEG", quality=95, subsampling=sub)
        dec = decode_jpeg(buf.getvalue())["pixels"]
        assert _psnr(px, dec) > (30.0 if sub == 0 else 20.0), sub


def test_jpeg_through_media_ingestion_and_ahash(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        decode_media_typed,
        media_ahash,
        read_media_dir,
    )

    rng = np.random.default_rng(6)
    # smooth image so the lossy re-encode stays aHash-close
    y, x = np.mgrid[0:32, 0:32]
    px = np.stack([(x * 8) % 256, (y * 8) % 256, ((x + y) * 4) % 256], axis=-1).astype(np.uint8)
    (tmp_path / "img.jpg").write_bytes(encode_jpeg(px))
    media = read_media_dir(spark, str(tmp_path))
    r = decode_media_typed(media).collect()[0]
    assert (r["kind"], r["format"], r["width"], r["height"]) == ("image", "jpeg", 32, 32)

    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px))), (2, bytearray(encode_jpeg(px)))],
        schema="media_id long, data binary",
    )
    hashes = {row["media_id"]: row["ahash"] for row in media_ahash(df).collect()}
    assert hashes[1] is not None and hashes[2] is not None
    hamming = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert hamming <= 6  # lossy re-encode stays within banded-Hamming reach


# --- MJPEG-AVI container ------------------------------------------------------


def _frames(colors, shape=(16, 24, 3)):
    return [np.full(shape, c, dtype=np.uint8) for c in colors]


def test_avi_container_roundtrip():
    from clickhouse_etl_loadtest_spark.operators.jpeg import decode_avi, encode_avi_mjpeg

    avi = encode_avi_mjpeg(_frames([10, 60, 110, 160, 210]), fps=5)
    d = decode_avi(avi)
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) == (24, 16, 5, 5.0)
    assert d["duration_ms"] == 1000
    for i, fb in enumerate(d["frames"]):
        px = decode_jpeg(fb)["pixels"]
        assert abs(int(px.astype(int).mean()) - (10 + 50 * i)) <= 1


def test_riff_sniff_disambiguation():
    from clickhouse_etl_loadtest_spark.operators.codecs import encode_wav
    from clickhouse_etl_loadtest_spark.operators.jpeg import encode_avi_mjpeg

    wav = encode_wav(np.zeros(100, dtype=np.int16))
    avi = encode_avi_mjpeg(_frames([50]), fps=2)
    assert sniff_format(wav) == "wav"
    assert sniff_format(avi) == "avi"
    assert sniff_format(b"RIFF\x00\x00\x00\x00JUNK") == "raw"
    d = real_decode(avi)
    assert (d["format"], d["width"], d["height"], d["n_samples"], d["sample_rate"]) == (
        "avi", 24, 16, 1, 2,
    )


def test_sample_frames_real_extracts_decodable_frames(spark):
    from clickhouse_etl_loadtest_spark.operators.jpeg import encode_avi_mjpeg
    from clickhouse_etl_loadtest_spark.operators.multimodal import sample_frames_real

    # 9 frames, max 4 -> evenly spaced picks land on source frames 0, 3, 5, 8
    avi = encode_avi_mjpeg(_frames(list(range(10, 100, 10))), fps=3)
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi)), (2, "video", bytearray(b"not a container"))],
        schema="media_id long, kind string, data binary",
    )
    out = sample_frames_real(df, max_frames=4).collect()
    real = sorted((r["frame_no"], bytes(r["frame"])) for r in out if r["media_id"] == 1)
    assert [n for n, _ in real] == [0, 1, 2, 3]
    means = [int(decode_jpeg(fb)["pixels"].astype(int).mean()) for _, fb in real]
    assert [round(m, -1) for m in means] == [10, 40, 60, 90]  # frames 0,3,5,8
    # non-container video payloads fall back to byte chunks
    fallback = [r for r in out if r["media_id"] == 2]
    assert len(fallback) == 1 and bytes(fallback[0]["frame"]) == b"not a container"


def test_avi_file_through_media_ingestion(spark, tmp_path):
    from clickhouse_etl_loadtest_spark.operators.jpeg import encode_avi_mjpeg
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        decode_media_typed,
        read_media_dir,
    )

    (tmp_path / "clip.avi").write_bytes(encode_avi_mjpeg(_frames([30, 90, 150]), fps=3))
    media = read_media_dir(spark, str(tmp_path))
    r = decode_media_typed(media).collect()[0]
    assert (r["kind"], r["format"], r["width"], r["height"], r["n_samples"], r["duration_ms"]) == (
        "video", "avi", 24, 16, 3, 1000,
    )
