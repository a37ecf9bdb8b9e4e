"""Multimodal-pipeline queries: binary-column decode / feature-extract /
frame-sample over the synthesized media table (operators/multimodal.py).

``multimodal_decode`` is oracle-checked: the fake decoder's outputs (byte
length, md5 checksum, first byte) are reproducible in SQL because the payload
is the documents fixture's utf-8 bytes. The feature/frame stages are
rows-only checks (Python histogram math has no clean SQL twin) — their
correctness is pinned by unit tests instead (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import build_media_table, decode_media, extract_features, sample_frames
from . import register

_DECODE_ORACLE = """
SELECT doc_id AS media_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(CASE WHEN unicode(substr(text, 1, 1)) < 128 THEN unicode(substr(text, 1, 1))
                 WHEN unicode(substr(text, 1, 1)) < 2048 THEN 192 + unicode(substr(text, 1, 1)) // 64
                 WHEN unicode(substr(text, 1, 1)) < 65536 THEN 224 + unicode(substr(text, 1, 1)) // 4096
                 ELSE 240 + unicode(substr(text, 1, 1)) // 262144 END AS INT) AS first_byte
FROM documents
ORDER BY media_id
"""


@register("multimodal_decode", _DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode through the Arrow-batched mapInPandas stage: validates
    the whole multimodal plumbing (binary column -> Python batch -> typed
    output schema) against a SQL oracle."""
    media = build_media_table(spark, sf_dir)
    return decode_media(media).orderBy("media_id")


# The bin of each byte is byte % 16 == its low nibble == the 2nd hex digit of
# that byte in hex(encode(text)). regexp_replace keeps every 2nd char, then
# each bin count is an occurrence count of one hex digit — exact integers,
# hash-comparable across engines (arrays would crash the driver canonicalizer).
_FEATURES_ORACLE = (
    "WITH h AS (SELECT doc_id AS media_id, "
    "regexp_replace(hex(encode(text)), '.(.)', '\\1', 'g') AS nib FROM documents) "
    "SELECT media_id, "
    + ", ".join(
        f"CAST(length(nib) - length(replace(nib, '{d}', '')) AS BIGINT) AS c{i:02d}"
        for i, d in enumerate("0123456789ABCDEF")
    )
    + " FROM h ORDER BY media_id"
)


@register("multimodal_features", _FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (byte-histogram embedding) through the Arrow-batched
    mapInPandas stage, surfaced as 16 integer bin-count columns so the driver
    can value-check it (the normalized float32 array form stays internal —
    see operators/multimodal.py::extract_features)."""
    media = build_media_table(spark, sf_dir)
    feats = extract_features(media, normalize=False)
    return feats.select(
        "media_id", *[F.col("feature").getItem(i).alias(f"c{i:02d}") for i in range(16)]
    ).orderBy("media_id")


@register("multimodal_frame_sample", None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 row -> N frames): rows-only driver check."""
    media = build_media_table(spark, sf_dir)
    return sample_frames(media).orderBy("media_id", "frame_no")


@register("multimodal_resize", None)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload resize/downsample (stride sampling standing in for the gated
    PIL path): rows-only driver check; determinism + size bounds pinned in
    tests/test_multimodal.py."""
    from ..operators.multimodal import resize_media

    media = build_media_table(spark, sf_dir)
    return resize_media(media).drop("data").orderBy("media_id")
