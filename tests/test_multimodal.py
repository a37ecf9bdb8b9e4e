"""Multimodal plumbing tests: schemas, Arrow batch shapes, 1->N frame
expansion, decoder gating (SURVEY.md §7.6 / task spec multimodal bullet)."""

import hashlib

import pytest

from clickhouse_etl_loadtest_spark.operators.multimodal import (
    FEATURE_BINS,
    build_media_table,
    decode_media,
    extract_features,
    fake_decode,
    real_image_decode,
    sample_frames,
)


def test_media_table_schema(spark, sf_dir):
    media = build_media_table(spark, sf_dir)
    dtypes = dict(media.dtypes)
    assert dtypes["data"] == "binary"
    assert dtypes["kind"] == "string"
    assert dtypes["meta"].startswith("struct<format:string,width:int")
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_matches_local_hash(spark, sf_dir):
    media = build_media_table(spark, sf_dir)
    row = media.orderBy("media_id").first()
    decoded = decode_media(media).orderBy("media_id").first()
    assert decoded.media_id == row.media_id
    assert decoded.n_bytes == len(bytes(row.data))
    assert decoded.checksum == hashlib.md5(bytes(row.data)).hexdigest()
    assert decoded.first_byte == bytes(row.data)[0]


def test_feature_shape_and_normalization(spark, sf_dir):
    media = build_media_table(spark, sf_dir).limit(20)
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == FEATURE_BINS
        assert abs(sum(r.feature) - 1.0) < 1e-3  # L1-normalized
        assert all(v >= 0 for v in r.feature)


def test_frame_sampling_expands_rows(spark, sf_dir):
    media = build_media_table(spark, sf_dir)
    n_videos = media.where("kind = 'video'").count()
    frames = sample_frames(media, frame_bytes=64, max_frames=4)
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_videos
    assert all(1 <= r["count"] <= 4 for r in got)
    one = frames.orderBy("media_id", "frame_no").first()
    assert isinstance(bytes(one.frame), bytes) and len(bytes(one.frame)) <= 64


_HAS_PIL = __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="pillow installed: the absence gate cannot fire")
def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError, match="PIL"):
        real_image_decode(b"\x89PNG")


@pytest.mark.skipif(not _HAS_PIL, reason="pillow not installed in this environment")
def test_real_image_decode_with_pil(spark):
    """Wherever pillow exists the hook is a REAL decoder: a generated PNG
    round-trips with true pixel dimensions, both directly and through the
    Arrow-batched decode_images stage."""
    import io

    from PIL import Image

    from clickhouse_etl_loadtest_spark.operators.multimodal import decode_images

    buf = io.BytesIO()
    Image.new("RGB", (5, 3), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()

    d = real_image_decode(png)
    assert d["format"] == "png"
    assert (d["width"], d["height"], d["mode"]) == (5, 3, "RGB")
    assert d["checksum"] == hashlib.md5(png).hexdigest()

    df = spark.createDataFrame([(1, png)], "media_id long, data binary")
    row = decode_images(df).collect()[0]
    assert (row["width"], row["height"], row["format"]) == (5, 3, "png")
    assert row["checksum"] == hashlib.md5(png).hexdigest()


def test_fake_decode_empty_payload():
    d = fake_decode(b"")
    assert d["n_bytes"] == 0 and d["first_byte"] is None


def test_resize_bounds_payload_and_is_deterministic(spark, sf_dir):
    from clickhouse_etl_loadtest_spark.operators.multimodal import build_media_table, resize_media

    media = build_media_table(spark, sf_dir)
    out = resize_media(media, target_bytes=128)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r["resized_bytes"] <= 128
        assert r["resized_bytes"] == len(r["data"])
        assert r["orig_bytes"] >= r["resized_bytes"]
    # deterministic across runs
    a = {r["media_id"]: bytes(r["data"]) for r in rows}
    b = {r["media_id"]: bytes(r["data"]) for r in resize_media(media, target_bytes=128).collect()}
    assert a == b


def test_typed_decode_empty_batch_keeps_schema(spark, sf_dir):
    # an empty micro-batch must still yield all REAL_DECODED_SCHEMA columns
    # (pd.DataFrame([]) would drop them and fail Arrow conversion)
    from clickhouse_etl_loadtest_spark.operators.multimodal import decode_media_typed
    import pyspark.sql.functions as F

    media = build_media_table(spark, sf_dir).where(F.lit(False))
    out = decode_media_typed(media)
    assert out.count() == 0
    assert len(out.columns) == 10
