"""Real media feature extraction (operators/multimodal.py): audio
log-spectrogram embeddings (frequency localization, exact gain invariance,
ANN-compatible shape) and video motion / scene-cut scoring over MJPEG-AVI
(static vs cut vs gradual-motion clips, computed against hand-built
frames)."""

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import (
    encode_wav,
    spectrogram_features,
)
from clickhouse_etl_loadtest_spark.operators.jpeg import encode_avi_mjpeg
from clickhouse_etl_loadtest_spark.operators.multimodal import (
    media_spectrogram,
    video_motion_scores,
)


def _tone(freq, sr=8000, secs=1.0, amp=3000):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


# --- spectrogram features -----------------------------------------------------


def test_frequency_localization():
    lo = spectrogram_features(_tone(200)).reshape(8, 8)
    hi = spectrogram_features(_tone(3500)).reshape(8, 8)
    assert int(lo.mean(axis=0).argmax()) == 0
    assert int(hi.mean(axis=0).argmax()) >= 6
    # distinct tones -> far-apart features; same tone -> identical
    assert np.abs(lo - hi).max() > 3.0
    assert np.abs(
        spectrogram_features(_tone(200)) - spectrogram_features(_tone(200))
    ).max() == 0.0


def test_exact_gain_invariance():
    s = _tone(440).astype(np.float64)
    a, b = spectrogram_features(s), spectrogram_features(s * 0.037)
    assert float(np.abs(a - b).max()) < 1e-4  # float32 rounding only


def test_fixed_shape_regardless_of_length():
    for secs in (0.01, 0.3, 2.0):
        assert spectrogram_features(_tone(500, secs=secs)).shape == (64,)


def test_spark_stage_wav_only(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(_tone(200), sample_rate=8000))),
            (2, bytearray(encode_wav(_tone(3500), sample_rate=8000))),
            (3, bytearray(b"not audio")),
        ],
        schema="media_id long, data binary",
    )
    rows = {r["media_id"]: r["feature"] for r in media_spectrogram(df).collect()}
    assert rows[3] is None
    assert len(rows[1]) == 64 and len(rows[2]) == 64
    lo = np.array(rows[1]).reshape(8, 8).mean(axis=0)
    hi = np.array(rows[2]).reshape(8, 8).mean(axis=0)
    assert int(lo.argmax()) == 0 and int(hi.argmax()) >= 6


# --- video motion / scene cuts ------------------------------------------------


def _avi(colors):
    return encode_avi_mjpeg(
        [np.full((16, 16, 3), c, dtype=np.uint8) for c in colors], fps=4
    )


def test_motion_scores_static_cut_gradual(spark):
    static = _avi([100] * 6)
    one_cut = _avi([40, 40, 40, 200, 200, 200])
    gradual = _avi([100, 104, 108, 112, 116, 120])  # small steps, no cut
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(static)),
            (2, "video", bytearray(one_cut)),
            (3, "video", bytearray(gradual)),
            (4, "video", bytearray(b"junk")),
        ],
        schema="media_id long, kind string, data binary",
    )
    rows = {r["media_id"]: r for r in video_motion_scores(df, max_frames=6).collect()}
    assert rows[1]["mean_motion"] <= 1.0 and rows[1]["n_cuts"] == 0
    assert rows[2]["n_cuts"] == 1 and rows[2]["max_motion"] > 100.0
    assert rows[3]["n_cuts"] == 0 and 0.0 < rows[3]["mean_motion"] < 10.0
    assert rows[4]["mean_motion"] is None and rows[4]["n_frames"] is None
    # ordering: the cut clip is the most dynamic, the static clip the least
    assert rows[2]["max_motion"] > rows[3]["max_motion"] > rows[1]["max_motion"]


def test_motion_frame_sampling_cap(spark):
    many = _avi(list(range(10, 250, 10)))  # 24 frames
    df = spark.createDataFrame(
        [(1, "video", bytearray(many))], schema="media_id long, kind string, data binary"
    )
    r = video_motion_scores(df, max_frames=5).collect()[0]
    assert r["n_frames"] == 5  # evenly spaced cap, not all 24
    assert r["mean_motion"] > 0


def test_audio_near_dup_end_to_end(spark):
    """The promised composition: spectrogram embeddings feed the exact
    blocked-cosine near-dup join unchanged — a clip and its slightly
    gain/noise-perturbed twin pair up, a different-frequency clip does not."""
    from clickhouse_etl_loadtest_spark.operators.blockjoin import blocked_cosine_pairs

    rng = np.random.default_rng(0)
    base = _tone(440).astype(np.float64)
    perturbed = base * 0.8 + rng.normal(0, 20, size=base.shape)
    other = _tone(1800).astype(np.float64)
    feats = [
        (1, spectrogram_features(base).tolist()),
        (2, spectrogram_features(perturbed).tolist()),
        (3, spectrogram_features(other).tolist()),
    ]
    df = spark.createDataFrame(feats, schema="vec_id long, embedding array<float>")
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in blocked_cosine_pairs(df, threshold=0.9).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
