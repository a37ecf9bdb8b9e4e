"""Real-file media ingestion: a directory of actual WAV/PPM files read
through Spark's binaryFile source must land in the media-table contract and
flow through the typed decode stage with the encoded facts intact —
the first-mile path that the synthesized media table cannot exercise.

Reference scope: the reference repo has no media path at all; this extends
the LLM-pipeline multimodal stack (SURVEY.md extension table)."""

import numpy as np
import pytest

from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm, encode_wav
from clickhouse_etl_loadtest_spark.operators.multimodal import (
    decode_media_typed,
    read_media_dir,
    resize_media,
)


@pytest.fixture()
def media_dir(tmp_path):
    rng = np.random.default_rng(7)
    samples = (rng.integers(-2000, 2000, size=800)).astype(np.int16)
    (tmp_path / "clips").mkdir()
    (tmp_path / "clips" / "a.wav").write_bytes(encode_wav(samples, sample_rate=8000))
    pixels = rng.integers(0, 255, size=(12, 9, 3)).astype(np.uint8)
    (tmp_path / "b.ppm").write_bytes(encode_ppm(pixels))
    (tmp_path / "notes.txt").write_bytes(b"not media")
    return str(tmp_path)


def test_read_media_dir_lands_contract_and_kinds(spark, media_dir):
    media = read_media_dir(spark, media_dir)
    rows = {r["kind"]: r for r in media.collect()}
    assert set(rows) == {"audio", "image", "other"}
    assert rows["audio"]["meta"]["path"].endswith("a.wav")  # recursive lookup
    assert rows["image"]["meta"]["n_bytes"] == len(bytes(rows["image"]["data"]))
    # deterministic ids: same directory -> same ids on a re-read
    again = {r["kind"]: r["media_id"] for r in read_media_dir(spark, media_dir).collect()}
    assert {k: r["media_id"] for k, r in rows.items()} == again


def test_glob_filter_prunes_before_bytes_move(spark, media_dir):
    only_wav = read_media_dir(spark, media_dir, glob="*.wav")
    assert [r["kind"] for r in only_wav.collect()] == ["audio"]


def test_ingested_files_decode_with_encoded_facts(spark, media_dir):
    media = read_media_dir(spark, media_dir)
    decoded = {r["kind"]: r for r in decode_media_typed(media).collect()}
    wav = decoded["audio"]
    assert wav["format"] == "wav"
    assert wav["sample_rate"] == 8000
    assert wav["n_samples"] == 800
    assert wav["duration_ms"] == 100  # 800 samples @ 8 kHz
    img = decoded["image"]
    assert img["format"] == "ppm"
    assert (img["width"], img["height"]) == (9, 12)
    other = decoded["other"]
    assert other["format"] == "raw"  # sniffing, not the extension, decides


def test_ingested_files_flow_through_resize(spark, media_dir):
    media = read_media_dir(spark, media_dir)
    out = resize_media(media, target_bytes=64).collect()
    assert all(r["resized_bytes"] <= max(64, r["orig_bytes"]) for r in out)
    assert all(r["resized_bytes"] <= 64 for r in out if r["orig_bytes"] > 64)
