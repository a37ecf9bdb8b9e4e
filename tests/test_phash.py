"""Perceptual-hash image dedup (operators/multimodal.py ahash/phash):
planted near-duplicates (brightness shift, resample) must pair up within
the Hamming budget, unrelated noise images must not, and the invariances
the hash claims must hold exactly where claimed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm, resize_ppm
from clickhouse_etl_loadtest_spark.operators.multimodal import (
    ahash_pixels,
    media_ahash,
    phash_near_pairs,
)


def _img(rng, h=32, w=32):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _smooth_img(rng, h=32, w=32):
    """Spatially correlated image (low-frequency pattern + mild noise) —
    the realistic case; pure white noise is aHash's adversarial worst case
    under resampling because block means hover at the global mean."""
    y = np.arange(h)[:, None] / h
    x = np.arange(w)[None, :] / w
    # per-image random spatial frequencies/orientation so DIFFERENT images
    # have genuinely different coarse structure (one shared mode would make
    # every image a near-dup of every other by construction)
    fy, fx = rng.integers(1, 5, size=2)
    phase = rng.uniform(0, 2 * np.pi, size=(3, 2))
    base = np.stack(
        [
            128
            + 60 * np.sin(2 * np.pi * fy * y + phase[c, 0])
            + 60 * np.cos(2 * np.pi * fx * x + phase[c, 1])
            for c in range(3)
        ],
        axis=2,
    )
    noise = rng.normal(0, 8, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def test_ahash_exactly_invariant_to_uniform_brightness():
    """A uniform brightness shift moves every block mean AND the global mean
    by the same amount, so the thresholded bits are bit-identical."""
    rng = np.random.default_rng(7)
    base = (_img(rng).astype(np.int64) % 200).astype(np.uint8)  # headroom: +10 never clips
    assert ahash_pixels(base) == ahash_pixels((base + 10).astype(np.uint8))


def test_ahash_stable_under_resample():
    rng = np.random.default_rng(11)
    px = _smooth_img(rng, 40, 40)
    data = encode_ppm(px)
    resized = resize_ppm(data, 32, 32)
    from clickhouse_etl_loadtest_spark.operators.codecs import decode_ppm

    h1 = ahash_pixels(px)
    h2 = ahash_pixels(decode_ppm(resized)["pixels"])
    assert bin(h1 ^ h2).count("1") <= 3  # correlated images: few bits move


def test_phash_near_pairs_finds_planted_dupes_only(spark):
    rng = np.random.default_rng(42)
    rows = []
    originals = {}
    for i in range(20):
        px = np.clip(_smooth_img(rng).astype(np.int64), 0, 200).astype(np.uint8)
        originals[i] = px
        rows.append((i, bytearray(encode_ppm(px))))
    # planted duplicates: 20+i is a brightness-shifted copy of i (exact hash
    # match), 40+i is a resampled copy (within a few bits)
    for i in (0, 3, 7):
        rows.append((20 + i, bytearray(encode_ppm((originals[i] + 10).astype(np.uint8)))))
        rows.append((40 + i, bytearray(resize_ppm(encode_ppm(originals[i]), 28, 28))))
    # one non-image payload: must be ignored, not crash
    rows.append((99, bytearray(b"not an image at all")))
    df = spark.createDataFrame(rows, "media_id long, data binary")
    hashed = media_ahash(df)
    assert hashed.where(F.col("media_id") == 99).first()["ahash"] is None
    got = {
        (r["media_a"], r["media_b"]) for r in phash_near_pairs(hashed, max_hamming=3).collect()
    }
    for i in (0, 3, 7):
        assert (i, 20 + i) in got, (i, sorted(got))
    planted = {(i, 20 + i) for i in (0, 3, 7)} | {(i, 40 + i) for i in (0, 3, 7)} | {
        (20 + i, 40 + i) for i in (0, 3, 7)
    }
    # any extra pair must be a TRUE perceptual collision (reference numpy
    # hashes within budget) — never a pipeline artifact; and the operator
    # must have missed nothing the reference finds among the originals
    ref = {i: ahash_pixels(px) for i, px in originals.items()}
    for a, b in got - planted:
        if a in ref and b in ref:
            assert bin((ref[a] ^ ref[b]) & ((1 << 64) - 1)).count("1") <= 3, (a, b)
    for a in ref:
        for b in ref:
            if a < b and bin((ref[a] ^ ref[b]) & ((1 << 64) - 1)).count("1") <= 3:
                assert (a, b) in got, (a, b)


def test_phash_rejects_unattainable_recall(spark):
    df = spark.createDataFrame([(1, 5)], "media_id long, ahash long")
    with pytest.raises(ValueError, match="needs > 4 bands"):
        phash_near_pairs(df, max_hamming=4)


def test_phash_plan_is_hash_only_after_the_arrow_stage(spark):
    rng = np.random.default_rng(3)
    rows = [(i, bytearray(encode_ppm(_img(rng)))) for i in range(6)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    plan = (
        phash_near_pairs(media_ahash(df), max_hamming=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # bucket-collect pair expansion, no self-join
    assert "BatchEvalPython" not in plan  # only the Arrow MapInPandas stage
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "data#" not in ln, ln  # binaries never shuffle


# --- audio fingerprint (the WAV twin) ------------------------------------------------


def _am_tone(rng, n=8000, sr=16000):
    """Amplitude-modulated tone: structured energy envelope (the realistic
    case — constant-amplitude signals have a flat envelope, the fingerprint's
    adversarial worst case, like white noise for the image hash)."""
    t = np.arange(n) / sr
    f_env = rng.uniform(0.5, 4.0)
    f_car = rng.uniform(200, 2000)
    phase = rng.uniform(0, 2 * np.pi)
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * f_env * t + phase))
    sig = 12000 * env * np.sin(2 * np.pi * f_car * t)
    return sig.astype(np.int16)[:, None]


def test_audio_fingerprint_exactly_invariant_to_gain():
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        audio_fingerprint_samples,
    )

    rng = np.random.default_rng(5)
    s = (_am_tone(rng) // 2).astype(np.int16)  # headroom: x2 never clips
    assert audio_fingerprint_samples(s) == audio_fingerprint_samples((s * 2).astype(np.int16))


def test_audio_fingerprint_stable_under_resample():
    from clickhouse_etl_loadtest_spark.operators.codecs import decode_wav, encode_wav, resize_wav
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        audio_fingerprint_samples,
    )

    rng = np.random.default_rng(9)
    s = _am_tone(rng)
    h1 = audio_fingerprint_samples(s)
    resized = decode_wav(resize_wav(encode_wav(s), target_samples=6400))["samples"]
    h2 = audio_fingerprint_samples(resized)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3


def test_audio_fingerprint_short_clip_is_null():
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        audio_fingerprint_samples,
    )

    assert audio_fingerprint_samples(np.zeros((10, 1), dtype=np.int16)) is None


def test_audio_pairing_reuses_band_machinery(spark):
    from clickhouse_etl_loadtest_spark.operators.codecs import encode_wav
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        media_audio_fingerprint,
    )

    rng = np.random.default_rng(21)
    rows = []
    tones = {}
    for i in range(12):
        s = (_am_tone(rng) // 2).astype(np.int16)
        tones[i] = s
        rows.append((i, bytearray(encode_wav(s))))
    for i in (1, 4):  # planted: gain-doubled copies
        rows.append((100 + i, bytearray(encode_wav((tones[i] * 2).astype(np.int16)))))
    rows.append((99, bytearray(b"RIFFgarbage")))  # undecodable: ignored
    df = spark.createDataFrame(rows, "media_id long, data binary")
    hashed = media_audio_fingerprint(df)
    assert hashed.where(F.col("media_id") == 99).first()["ahash"] is None
    got = {
        (r["media_a"], r["media_b"])
        for r in phash_near_pairs(hashed, max_hamming=3).collect()
    }
    for i in (1, 4):
        assert (i, 100 + i) in got, sorted(got)
    # extras must be true envelope collisions, never artifacts
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        audio_fingerprint_samples,
    )

    ref = {i: audio_fingerprint_samples(s) for i, s in tones.items()}
    for a, b in got - {(i, 100 + i) for i in (1, 4)}:
        if a in ref and b in ref:
            assert bin((ref[a] ^ ref[b]) & ((1 << 64) - 1)).count("1") <= 3, (a, b)


# --- video temporal fingerprint (MJPEG AVI) -------------------------------------------


def _frames(rng, n=8, h=24, w=24):
    """Spatially-correlated frames with slow temporal drift (a 'shot')."""
    out = []
    base = _smooth_img(rng, h, w).astype(np.float64)
    for i in range(n):
        drift = rng.normal(0, 2, size=base.shape)
        out.append(np.clip(base + 5 * i + drift, 0, 255).astype(np.uint8))
    return out


def test_video_fingerprint_identity_and_reencode(spark):
    from clickhouse_etl_loadtest_spark.operators.jpeg import decode_avi, decode_jpeg, encode_avi_mjpeg
    from clickhouse_etl_loadtest_spark.operators.multimodal import video_fingerprint_bytes

    rng = np.random.default_rng(20260815)
    frames = _frames(rng)
    avi = encode_avi_mjpeg(frames)
    assert video_fingerprint_bytes(avi) == video_fingerprint_bytes(avi)
    # generation-loss copy: decode every frame, re-encode the pixel arrays —
    # a second JPEG pass moves a few bits, never a band-wiping number
    decoded = [decode_jpeg(f)["pixels"] for f in decode_avi(avi)["frames"]]
    avi2 = encode_avi_mjpeg(decoded)
    a, b = video_fingerprint_bytes(avi), video_fingerprint_bytes(avi2)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 3
    # a different shot lands well outside the pairing budget (3); smooth
    # low-frequency content keeps coarse 4x4 grids partially correlated, so
    # "far" means > 2x the budget, not ~32 random bits
    other = encode_avi_mjpeg(_frames(np.random.default_rng(7)))
    c = video_fingerprint_bytes(other)
    assert bin((a ^ c) & ((1 << 64) - 1)).count("1") > 6


def test_video_near_pairs_rides_the_shared_contract(spark):
    from clickhouse_etl_loadtest_spark.operators.jpeg import decode_avi, decode_jpeg, encode_avi_mjpeg
    from clickhouse_etl_loadtest_spark.operators.multimodal import (
        media_video_fingerprint,
        phash_near_pairs,
    )

    rng = np.random.default_rng(42)
    vids = []
    for i in range(6):
        vids.append((i, bytearray(encode_avi_mjpeg(_frames(np.random.default_rng(100 + i))))))
    # plant: 6 is a generation-loss copy of 0; 7 is a non-AVI payload
    gen = encode_avi_mjpeg(
        [decode_jpeg(f)["pixels"] for f in decode_avi(bytes(vids[0][1]))["frames"]]
    )
    vids.append((6, bytearray(gen)))
    vids.append((7, bytearray(b"not a riff payload")))
    df = spark.createDataFrame(vids, "media_id long, data binary")
    hashed = media_video_fingerprint(df)
    rows = {r["media_id"]: r["ahash"] for r in hashed.collect()}
    assert rows[7] is None  # non-AVI lands null, never poisons pairing
    pairs = {
        (r["media_a"], r["media_b"])
        for r in phash_near_pairs(hashed, max_hamming=3).collect()
    }
    assert (0, 6) in pairs
    assert all({a, b} == {0, 6} for a, b in pairs), pairs


def test_single_frame_video_fingerprints(spark):
    from clickhouse_etl_loadtest_spark.operators.jpeg import encode_avi_mjpeg
    from clickhouse_etl_loadtest_spark.operators.multimodal import video_fingerprint_bytes

    rng = np.random.default_rng(3)
    one = encode_avi_mjpeg([_smooth_img(rng)])
    assert video_fingerprint_bytes(one) is not None
