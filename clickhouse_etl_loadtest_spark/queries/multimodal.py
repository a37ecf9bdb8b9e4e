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


@register("multimodal_features", None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (byte-histogram embedding): rows-only driver check;
    value-level coverage in tests/test_multimodal.py."""
    media = build_media_table(spark, sf_dir)
    return extract_features(media).orderBy("media_id")


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
