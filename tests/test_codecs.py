"""Real-format codec coverage: PCM16 WAV and P6 PPM parse / resize roundtrips
(pure numpy, no media libraries), standalone and through the Spark
mapInPandas stages (decode_media_typed, resize_media(format_aware=True))."""

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    real_decode,
    real_resize,
    resize_ppm,
    resize_wav,
    sniff_format,
)


def _ramp_wav(n=1000, ch=1, rate=8000):
    s = (np.arange(n * ch).reshape(n, ch) % 3000 - 1500).astype(np.int16)
    return s, encode_wav(s, sample_rate=rate)


def test_wav_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        s, wav = _ramp_wav(n=500, ch=ch, rate=16000)
        d = decode_wav(wav)
        assert (d["sample_rate"], d["n_channels"], d["bit_depth"]) == (16000, ch, 16)
        assert d["n_samples"] == 500
        assert d["duration_ms"] == int(500 * 1000 / 16000)
        np.testing.assert_array_equal(d["samples"], s)


def test_wav_parser_walks_extra_chunks():
    s, wav = _ramp_wav(n=100)
    # splice a LIST chunk between fmt and data (odd size exercises padding)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    d = decode_wav(spliced)
    assert d["n_samples"] == 100
    np.testing.assert_array_equal(d["samples"], s)


def test_wav_resize_is_stride_sample_and_still_valid():
    s, wav = _ramp_wav(n=1000, rate=8000)
    out = resize_wav(wav, 100)
    d = decode_wav(out)  # output still parses -> format-valid
    assert d["n_samples"] == 100 and d["sample_rate"] == 8000
    idx = (np.arange(100) * 10.0).astype(np.int64)
    np.testing.assert_array_equal(d["samples"], s[idx])
    # upsize request is a no-op
    assert resize_wav(wav, 5000) == wav


def test_ppm_roundtrip_and_comment_header():
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    ppm = encode_ppm(px)
    d = decode_ppm(ppm)
    assert (d["width"], d["height"], d["maxval"]) == (6, 4, 255)
    np.testing.assert_array_equal(d["pixels"], px)
    commented = b"P6\n# a comment line\n6 4\n255\n" + ppm.split(b"255\n", 1)[1]
    np.testing.assert_array_equal(decode_ppm(commented)["pixels"], px)


def test_ppm_resize_nearest_neighbor():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_ppm(encode_ppm(px), 2, 2)
    d = decode_ppm(out)
    assert (d["width"], d["height"]) == (2, 2)
    np.testing.assert_array_equal(d["pixels"], px[[0, 2]][:, [0, 2]])


def test_sniff_and_real_decode_dispatch():
    _, wav = _ramp_wav(n=64, rate=4000)
    ppm = encode_ppm(np.zeros((2, 3, 3), dtype=np.uint8))
    assert sniff_format(wav) == "wav" and sniff_format(ppm) == "ppm"
    assert sniff_format(b"plain text") == "raw"
    dw = real_decode(wav)
    assert dw["format"] == "wav" and dw["n_samples"] == 64 and dw["width"] is None
    dp = real_decode(ppm)
    assert dp["format"] == "ppm" and (dp["width"], dp["height"]) == (3, 2)
    dr = real_decode(b"plain text")
    assert dr["format"] == "raw" and dr["n_bytes"] == 10


def test_real_resize_outputs_stay_decodable():
    _, wav = _ramp_wav(n=4000, rate=8000)
    out = real_resize(wav, 256)
    d = decode_wav(out)
    assert d["n_samples"] == (256 - 44) // 2 and len(out) <= 256 + 44
    ppm = encode_ppm(np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3))
    dp = decode_ppm(real_resize(ppm, 256))
    assert dp["width"] * dp["height"] * 3 <= 256 + 3  # side = floor(sqrt(85)) = 9
    raw = bytes(range(256)) * 4
    assert len(real_resize(raw, 100)) == 100


def test_invalid_payloads_raise():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM unsupported


def test_malformed_magic_matches_fall_back_to_raw():
    """A magic-prefix match is a hint, not a guarantee: malformed payloads
    must degrade to byte stats, never raise out of the dispatch (one bad row
    would otherwise abort the whole mapInPandas stage)."""
    malformed = [
        b"RIFFxxxxNOPEjunk",          # RIFF but not WAVE
        b"RIFF\x00\x00\x00\x00WAVE",  # WAVE with no fmt/data chunks
        b"P6xnot really a ppm",       # P6 prefix, garbage header
        b"P6\n3 2\n255\n",            # P6 header, truncated pixels -> reshape fails
    ]
    for data in malformed:
        d = real_decode(data)
        assert d["format"] == "raw" and d["n_bytes"] == len(data), data
        out = real_resize(data, 8)
        # byte-stride fallback applied: every malformed payload here is
        # longer than 8 bytes, so the fallback must hit the target exactly
        # (a silent no-op returning the input would fail this)
        assert len(out) == 8, data
    # non-PCM16 WAV (bits=8) also degrades instead of raising
    s, wav = _ramp_wav(n=16)
    bad_bits = bytearray(wav)
    bad_bits[34] = 8  # fmt chunk bit-depth field
    assert real_decode(bytes(bad_bits))["format"] == "raw"


def test_spark_typed_decode_and_format_aware_resize(spark):
    """End-to-end through the Arrow-batched stages: real WAV + PPM + raw
    payloads in one binary column, decoded and resized by magic bytes."""
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        decode_media_typed,
        resize_media,
    )

    s, wav = _ramp_wav(n=2000, ch=1, rate=8000)
    ppm = encode_ppm(np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3))
    rows = [
        (1, "audio", bytearray(wav)),
        (2, "image", bytearray(ppm)),
        (3, "video", bytearray(b"opaque-payload-" * 40)),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, data binary")

    decoded = {r["media_id"]: r for r in decode_media_typed(df).collect()}
    assert decoded[1]["format"] == "wav"
    assert decoded[1]["sample_rate"] == 8000 and decoded[1]["n_samples"] == 2000
    assert decoded[2]["format"] == "ppm"
    assert (decoded[2]["width"], decoded[2]["height"]) == (16, 16)
    assert decoded[3]["format"] == "raw" and decoded[3]["n_bytes"] == 15 * 40

    resized = {r["media_id"]: r for r in resize_media(df, 256, format_aware=True).collect()}
    dw = decode_wav(bytes(resized[1]["data"]))  # still a valid WAV
    assert dw["n_samples"] == (256 - 44) // 2 and dw["sample_rate"] == 8000
    dp = decode_ppm(bytes(resized[2]["data"]))  # still a valid PPM
    assert dp["width"] == dp["height"] == 9
    assert resized[3]["resized_bytes"] == 256  # raw fallback: byte stride
