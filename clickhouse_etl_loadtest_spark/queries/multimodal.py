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
       CAST(CASE WHEN strlen(text) = 0 THEN NULL
                 WHEN unicode(substr(text, 1, 1)) < 128 THEN unicode(substr(text, 1, 1))
                 WHEN unicode(substr(text, 1, 1)) < 2048 THEN 192 + unicode(substr(text, 1, 1)) // 64
                 WHEN unicode(substr(text, 1, 1)) < 65536 THEN 224 + unicode(substr(text, 1, 1)) // 4096
                 ELSE 240 + unicode(substr(text, 1, 1)) // 262144 END AS INT) AS first_byte
FROM documents
ORDER BY media_id
"""


@register("multimodal_decode", _DECODE_ORACLE, extra=True)
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


@register("multimodal_features", _FEATURES_ORACLE, extra=True)
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


# Frames over the RAW payload (no resize stage): byte j of a payload is hex
# chars [2j+1, 2j+2] of hex(encode(text)), frames are 64-byte chunks, at most
# 4 kept. 'video' kind <=> doc_id % 3 = 2 (MEDIA_KINDS round-robin).
_FRAME_SAMPLE_ORACLE = """
WITH v AS (
    SELECT doc_id AS media_id, hex(encode(text)) AS hx
    FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, CAST(k AS INT) AS frame_no,
       CAST(length(substr(hx, 128 * k + 1, 128)) / 2 AS BIGINT) AS frame_bytes,
       substr(hx, 128 * k + 1, 128) AS frame_hex
FROM v, generate_series(0, 3) AS s(k)
WHERE 128 * k < length(hx)
ORDER BY media_id, frame_no
"""


@register("multimodal_frame_sample", _FRAME_SAMPLE_ORACLE, extra=True)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 row -> N frames) on the raw payloads, frames
    emitted as hex so the SQL twin can replay the chunk arithmetic on
    hex(encode(text)) — the standalone half of ``multimodal_resize_frames``,
    now value-checked on its own (it was rows-only through round 4)."""
    media = build_media_table(spark, sf_dir).where(F.length("data") > 0)
    return (
        sample_frames(media)
        .select(
            "media_id",
            "frame_no",
            F.length("frame").cast("bigint").alias("frame_bytes"),
            F.hex("frame").alias("frame_hex"),
        )
        .orderBy("media_id", "frame_no")
    )


# Stride resize replayed on hex strings over ALL kinds (the sibling oracle's
# resz CTE without the video filter): byte floor(i * (n/256.0)) for i in
# 0..255 repeats numpy's multiply-then-floor IEEE order bit-for-bit.
_RESIZE_ORACLE = """
WITH v AS (
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           hex(encode(text)) AS hx, octet_length(encode(text)) AS n
    FROM documents
),
resz AS (
    SELECT media_id,
           string_agg(substr(hx, 2 * CAST(floor(i * (n / 256.0)) AS INT) + 1, 2), '' ORDER BY i) AS rhx
    FROM v, generate_series(0, 255) AS t(i)
    WHERE n > 256
    GROUP BY media_id
    UNION ALL
    SELECT media_id, hx AS rhx FROM v WHERE n <= 256
)
SELECT media_id, kind, CAST(n AS BIGINT) AS orig_bytes,
       CAST(length(rhx) / 2 AS BIGINT) AS resized_bytes, rhx AS resized_hex
FROM resz JOIN v USING (media_id)
ORDER BY media_id
"""


@register("multimodal_resize", _RESIZE_ORACLE, extra=True)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload resize/downsample (stride sampling standing in for the gated
    PIL path), the resized BYTES exposed as hex so the stride arithmetic is
    value-checked per row (sizes alone hid the payload through round 4);
    determinism + size bounds additionally pinned in tests/test_multimodal.py."""
    from ..operators.multimodal import resize_media

    media = build_media_table(spark, sf_dir)
    return (
        resize_media(media)
        .select(
            "media_id",
            "kind",
            F.col("orig_bytes").cast("bigint").alias("orig_bytes"),
            F.col("resized_bytes").cast("bigint").alias("resized_bytes"),
            F.hex("data").alias("resized_hex"),
        )
        .orderBy("media_id")
    )


# Chained resize -> frame-sample, fully value-checked: the stride resize picks
# byte floor(i * (n/256.0)) for i in 0..255 (the SQL repeats numpy's exact
# multiply-then-floor order so IEEE doubles agree bit-for-bit), each frame is a
# 64-byte chunk, and frames are compared as hex strings (byte j of a payload is
# hex chars [2j+1, 2j+2] of hex(encode(text))). 'video' kind <=> doc_id % 3 = 2
# (see MEDIA_KINDS round-robin in operators/multimodal.py::build_media_table).
_RESIZE_FRAMES_ORACLE = """
WITH v AS (
    SELECT doc_id AS media_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
    FROM documents WHERE doc_id % 3 = 2
),
resz AS (
    SELECT media_id,
           string_agg(substr(hx, 2 * CAST(floor(i * (n / 256.0)) AS INT) + 1, 2), '' ORDER BY i) AS rhx
    FROM v, generate_series(0, 255) AS t(i)
    WHERE n > 256
    GROUP BY media_id
    UNION ALL
    SELECT media_id, hx AS rhx FROM v WHERE n <= 256
)
SELECT media_id, CAST(k AS INT) AS frame_no,
       CAST(length(substr(rhx, 128 * k + 1, 128)) / 2 AS BIGINT) AS frame_bytes,
       substr(rhx, 128 * k + 1, 128) AS frame_hex
FROM resz, generate_series(0, 3) AS s(k)
WHERE 128 * k < length(rhx)
ORDER BY media_id, frame_no
"""


@register("multimodal_resize_frames", _RESIZE_FRAMES_ORACLE, extra=True)
def multimodal_resize_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-transform pipeline chained end-to-end: stride resize to 256
    bytes, then frame-sample the video payloads into 64-byte chunks — two
    Arrow-batched mapInPandas stages back to back, value-checked against a
    SQL twin that replays the stride arithmetic on hex strings. Frames are
    emitted as hex so the comparison is scalar (arrays/binary stay internal)."""
    from ..operators.multimodal import resize_media

    # empty payloads: the operator emits one empty frame (sample_frames'
    # contract) but the SQL twin naturally emits no row — align by filtering
    # empties out of this oracle-checked query (none exist in the fixtures;
    # this guards regenerated/scaled data)
    media = build_media_table(spark, sf_dir).where(F.length("data") > 0)
    frames = sample_frames(resize_media(media))
    return frames.select(
        "media_id",
        "frame_no",
        F.length("frame").cast("bigint").alias("frame_bytes"),
        F.hex("frame").alias("frame_hex"),
    ).orderBy("media_id", "frame_no")
