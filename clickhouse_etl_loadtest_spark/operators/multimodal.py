"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata
(the LLM-pipeline extension, SURVEY.md §7.6 scope; no reference counterpart).

Design for 100 TB of media:
- media rows live in parquet/Iceberg with the payload as a ``binary`` column
  and a typed ``meta`` struct; Spark never interprets the bytes until an
  explicit decode/feature stage.
- decode / feature-extract / frame-sample run as ``mapInPandas`` stages:
  Arrow-batched (one Python roundtrip per ~10k rows, not per row), schema
  declared up front, partition-parallel. These are the ONLY Python-side
  operators in the engine — everything else stays JVM-side.
- the actual codec calls (PIL/librosa/ffmpeg) are import-gated: this
  container has none of them, so each stage takes a ``decoder`` callable and
  ships a deterministic fake (byte-level stats) as the default. The Spark
  plumbing — schemas, batch shapes, partitioning — is real and tested; a real
  deployment swaps the callable, nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<format: string, width: int, height: int, sample_rate: int, duration_ms: int>"
)

DECODED_SCHEMA = "media_id bigint, kind string, n_bytes bigint, checksum string, first_byte int"

FEATURE_BINS = 16
FEATURE_SCHEMA = "media_id bigint, feature array<float>"
FEATURE_COUNTS_SCHEMA = "media_id bigint, feature array<bigint>"

FRAME_SCHEMA = "media_id bigint, frame_no int, frame binary"


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from the documents fixture: payload bytes =
    utf-8 text (deterministic fake), kind round-robins, metadata derives from
    doc stats. Stands in for `spark.read.parquet("s3://media/...")`."""
    from ..sources.tables import load_table

    d = load_table(spark, sf_dir, "documents", parallel=True)
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# --- decoders (swap for PIL/librosa/ffmpeg in a real deployment) --------------


def fake_decode(data: bytes) -> dict:
    """Deterministic byte-level 'decode': md5 checksum + size + first byte."""
    return {
        "n_bytes": len(data),
        "checksum": hashlib.md5(data).hexdigest(),
        "first_byte": data[0] if data else None,
    }


IMAGE_DECODED_SCHEMA = (
    "media_id bigint, format string, width int, height int, mode string, "
    "n_bytes bigint, checksum string"
)


def real_image_decode(data: bytes) -> dict:
    """PIL-backed image decode (PNG/JPEG/anything Pillow reads): real pixel
    header parse -> ``{format, width, height, mode, n_bytes, checksum}`` —
    the image twin of codecs.real_decode's WAV/PPM fields. Import-gated:
    raises NotImplementedError ONLY when Pillow is absent (this container);
    where pillow is installed the decode is fully functional (covered by the
    import-gated test in tests/test_multimodal.py)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL, which is not available in this "
            "environment; pass decoder=fake_decode or install pillow"
        ) from e
    import io

    with Image.open(io.BytesIO(data)) as im:
        im.load()  # force a full decode, not just the header probe
        return {
            "format": (im.format or "unknown").lower(),
            "width": im.width,
            "height": im.height,
            "mode": im.mode,
            "n_bytes": len(data),
            "checksum": hashlib.md5(data).hexdigest(),
        }


def decode_images(df: DataFrame) -> DataFrame:
    """Image-decode stage over ``real_image_decode``: same Arrow-batched
    ``mapInPandas`` contract as decode_media (one Python roundtrip per
    batch, 'data' pruned from the output). Usable wherever pillow is
    installed; in codec-free environments the NotImplementedError surfaces
    at task time — gate callers on PIL importability (as the tests do)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [real_image_decode(bytes(b)) for b in pdf["data"]]
            out = pd.DataFrame(
                {c: [r[c] for r in rows] for c in ("format", "width", "height", "mode", "n_bytes", "checksum")}
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(_decode, schema=IMAGE_DECODED_SCHEMA)


def decode_media(df: DataFrame, decoder: Callable[[bytes], dict] = fake_decode) -> DataFrame:
    """Decode stage: binary -> structured metadata via Arrow-batched Python.

    mapInPandas (not a scalar UDF) so one batch amortizes the Python
    transfer, the decoder can drop/emit rows, and the 'data' column can be
    pruned from the output without a second projection.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({"media_id": pdf["media_id"], "kind": pdf["kind"]})
            decoded = pdf["data"].map(lambda b: decoder(bytes(b)))
            out["n_bytes"] = decoded.map(lambda d: d["n_bytes"]).astype("int64")
            out["checksum"] = decoded.map(lambda d: d["checksum"])
            out["first_byte"] = decoded.map(lambda d: d["first_byte"])
            yield out

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, bins: int = FEATURE_BINS, normalize: bool = True) -> DataFrame:
    """Feature-extract stage: byte-histogram 'embedding' (deterministic fake
    for a CNN/CLIP encoder). Output shape array<float>[bins], L1-normalized;
    with ``normalize=False`` emits the raw int64 bin counts instead (exact
    integers — cross-engine hash-comparable, used by the oracle-checked
    driver query)."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["data"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % bins, minlength=bins)
                if normalize:
                    total = hist.sum() or 1.0
                    feats.append((hist / total).astype("float32").tolist())
                else:
                    feats.append(hist.astype("int64").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(_feat, schema=FEATURE_SCHEMA if normalize else FEATURE_COUNTS_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sample stage (video analogue): split the payload into fixed-size
    chunks, keep every chunk up to ``max_frames`` — the shape of an ffmpeg
    keyframe sampler (1 input row -> N output rows)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(b)
                n_chunks = -(-len(raw) // frame_bytes) if raw else 1  # ceil: tail partial chunk kept
                for i in range(min(max_frames, max(1, n_chunks))):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.where(F.col("kind") == "video").mapInPandas(_frames, schema=FRAME_SCHEMA)


REAL_DECODED_SCHEMA = (
    "media_id bigint, kind string, format string, n_bytes bigint, sample_rate int, "
    "n_samples bigint, n_channels int, width int, height int, duration_ms int"
)


def decode_media_typed(df: DataFrame) -> DataFrame:
    """Format-aware decode stage: real header parsing for the dependency-free
    formats (PCM16 WAV, P6 PPM — operators/codecs.py), byte stats for
    anything else. Same Arrow-batched mapInPandas contract as decode_media;
    a real deployment extends codecs.real_decode's dispatch with PIL/ffmpeg
    instead of swapping the Spark stage."""
    from .codecs import real_decode

    # decode column names derived from the schema itself (skip the two
    # id columns prepended below) — no second hand-maintained list
    _DECODE_COLS = tuple(f.strip().split()[0] for f in REAL_DECODED_SCHEMA.split(","))[2:]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [real_decode(bytes(b)) for b in pdf["data"]]
            # dict-of-lists keeps all columns present on an empty batch;
            # pd.DataFrame([]) would drop them and break the Arrow schema.
            out = pd.DataFrame({c: [r[c] for r in rows] for c in _DECODE_COLS})
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(_decode, schema=REAL_DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id bigint, kind string, data binary, orig_bytes bigint, resized_bytes bigint"


def resize_media(df: DataFrame, target_bytes: int = 256, format_aware: bool = False) -> DataFrame:
    """Resize stage (image analogue): downsample the payload to
    ``target_bytes`` by stride sampling — the deterministic stand-in for a
    PIL ``Image.resize`` (the real decoder is gated, see real_image_decode).
    Keeps the binary column + size metadata so downstream stages (feature
    extraction, dedup-by-checksum) run on bounded payloads — at 100 TB the
    resize is what makes the multimodal corpus shuffle-able.

    ``format_aware=True`` routes through codecs.real_resize: WAV payloads
    resample in time, PPM in space (both stay decodable), raw bytes fall back
    to the same codecs.stride_sample this path uses directly."""
    from .codecs import real_resize, stride_sample

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"media_id": [], "kind": [], "data": [], "orig_bytes": [], "resized_bytes": []}
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                raw = bytes(b)
                if format_aware:
                    resized = real_resize(raw, target_bytes)
                else:
                    resized = stride_sample(raw, target_bytes)
                out_rows["media_id"].append(mid)
                out_rows["kind"].append(kind)
                out_rows["data"].append(resized)
                out_rows["orig_bytes"].append(len(raw))
                out_rows["resized_bytes"].append(len(resized))
            yield pd.DataFrame(out_rows)

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


# --- perceptual-hash near-duplicate detection (image dedup) --------------------------
#
# aHash (average hash; classic public recipe): grayscale -> block-average to
# a g x g grid -> threshold each cell at the grid mean -> pack to g*g bits.
# Invariant to uniform brightness shifts EXACTLY (the mean shifts equally)
# and stable under resampling (block averages change little), so re-encoded
# / resized / brightness-tweaked copies land within a few Hamming bits —
# the image-side analogue of the text stack's SimHash family. Pairing then
# reuses the banded-Hamming machinery (pigeonhole: with 4 bands of 16 bits,
# Hamming <= 3 implies >= one identical band — recall 1.0 by construction),
# so after the one Arrow-batched hash pass everything is JVM column ops:
# band explode, bucket-collect pair expansion, xor + bit_count verify.
# Scale: the corpus shuffles only (band, 16-bit key, 64-bit hash) longs.

_AHASH_GRID = 8
_AHASH_BANDS = 4
_AHASH_BAND_BITS = (_AHASH_GRID * _AHASH_GRID) // _AHASH_BANDS  # 16


def _pack_bits_signed64(bits) -> int:
    """Pack a 64-bool sequence into a SIGNED int64 (bit 63 set would
    overflow LongType / pandas Int64 as unsigned); xor + bit_count
    downstream are bit-identical either way."""
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def ahash_pixels(pixels, grid: int = _AHASH_GRID) -> int:
    """64-bit average hash of an (h, w, 3) uint8 array."""
    gray = np.asarray(pixels, dtype=np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    blocks = np.empty((grid, grid))
    for r in range(grid):
        for c in range(grid):
            blocks[r, c] = gray[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
    return _pack_bits_signed64((blocks > blocks.mean()).ravel())


def _media_hash_stage(
    df: DataFrame, fmt: str | tuple[str, ...], hasher, data_col: str, id_col: str
) -> DataFrame:
    """Shared Arrow-batched fingerprint stage: adds ``ahash`` (nullable
    long — null for payloads not matching ``fmt`` (a format name or a tuple
    of them) or failing to decode). One Python roundtrip per batch; the
    binary column never leaves this stage. ``hasher(raw_bytes) -> int |
    None`` supplies the per-format fingerprint (image aHash, audio
    envelope, ...)."""
    from .codecs import sniff_format

    fmts = (fmt,) if isinstance(fmt, str) else tuple(fmt)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf[data_col]:
                raw = bytes(b)
                if sniff_format(raw) in fmts:
                    try:
                        hashes.append(hasher(raw))
                    except Exception:
                        hashes.append(None)
                else:
                    hashes.append(None)
            yield pd.DataFrame({id_col: pdf[id_col].values, "ahash": pd.array(hashes, dtype="Int64")})

    return df.mapInPandas(_hash, schema=f"{id_col} long, ahash long")


def media_ahash(df: DataFrame, data_col: str = "data", id_col: str = "media_id") -> DataFrame:
    """Image fingerprint stage: aHash over decodable PPM, PNG and JPEG
    payloads (one hash contract across image formats — a PPM and its
    lossless PNG re-encode fingerprint identically, pinned in
    tests/test_png.py; a lossy JPEG re-encode lands within a few Hamming
    bits, pinned in tests/test_jpeg.py — which is exactly what the
    banded-Hamming pairing downstream is for)."""
    from .codecs import decode_jpeg, decode_png, decode_ppm, sniff_format

    from .codecs import decode_gif

    _decoders = {
        "ppm": decode_ppm,
        "png": decode_png,
        "jpeg": decode_jpeg,
        "gif": lambda raw: {"pixels": decode_gif(raw)["frames"][0]["pixels"]},
    }

    def _hash_image(raw: bytes) -> int:
        px = _decoders[sniff_format(raw)](raw)["pixels"]
        if px.ndim == 3 and px.shape[2] == 4:
            px = px[:, :, :3]  # alpha carries no luminance
        return ahash_pixels(px)

    return _media_hash_stage(df, ("ppm", "png", "jpeg", "gif"), _hash_image, data_col, id_col)


def phash_near_pairs(
    hashed: DataFrame, max_hamming: int = 3, id_col: str = "media_id"
) -> DataFrame:
    """Near-duplicate media pairs: Hamming(hash_a, hash_b) <= max_hamming
    over the ``ahash`` column (image aHash or audio fingerprint — same
    contract). Delegates to the shared banded-Hamming machinery
    (operators/banded.py): exact-recall candidate generation, bucket-collect
    pair expansion, join-free xor + bit_count verify — all JVM-side."""
    from .banded import banded_hamming_pairs

    return banded_hamming_pairs(
        hashed,
        hash_col="ahash",
        id_col=id_col,
        n_bands=_AHASH_BANDS,
        band_bits=_AHASH_BAND_BITS,
        max_hamming=max_hamming,
        out_a="media_a",
        out_b="media_b",
    )


# --- audio fingerprinting (the WAV-side twin of the image aHash) ---------------------
#
# Energy-envelope fingerprint: mix to mono, split into 64 equal frames,
# per-frame RMS energy, threshold at the MEDIAN frame energy -> 64 balanced
# bits. Exactly invariant to uniform gain (energies and their median scale
# together) and stable under resampling (frame energies are averages).
# Pairing reuses :func:`phash_near_pairs` unchanged — the fingerprint rides
# the same ``ahash`` column contract.

_AFP_FRAMES = _AHASH_GRID * _AHASH_GRID  # 64 bits, same band geometry


def audio_fingerprint_samples(samples, frames: int = _AFP_FRAMES) -> int | None:
    """Signed-64-bit envelope fingerprint of an (n, ch) int16 array; None
    for clips too short to fill one sample per frame."""
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    n = mono.shape[0]
    if n < frames:
        return None
    bounds = (np.arange(frames + 1) * n) // frames
    energy = np.asarray(
        [np.sqrt(np.mean(mono[bounds[i] : bounds[i + 1]] ** 2)) for i in range(frames)]
    )
    return _pack_bits_signed64(energy > np.median(energy))


def media_audio_fingerprint(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """Audio fingerprint stage: energy envelope over decodable PCM16 WAV.
    Same ``ahash`` column contract as :func:`media_ahash`, so
    :func:`phash_near_pairs` pairs either."""
    from .codecs import decode_wav

    return _media_hash_stage(
        df,
        "wav",
        lambda raw: audio_fingerprint_samples(decode_wav(raw)["samples"]),
        data_col,
        id_col,
    )


# --- video fingerprinting (the MJPEG-AVI twin of the image aHash) --------------------
#
# Temporal fingerprint: sample _VFP_FRAMES evenly-spaced frames from the
# container (first and last always included), give each frame a 16-bit
# mini-aHash (4x4 block means thresholded at the frame mean), concatenate ->
# 64 bits. One frame == one 16-bit band, which is EXACTLY the banded-Hamming
# geometry downstream: a re-encode (JPEG quality change) moves a few bits
# inside bands, while any unchanged frame leaves its band identical, so
# recall-1.0 candidate generation holds by the same pigeonhole as images.
# Out of scope (documented, not claimed): temporal trims/shifts move the
# sample points themselves; shot-level matching needs a per-frame index
# (the image pipeline on exploded frames — sample_frames_real feeds it).

_VFP_FRAMES = _AHASH_BANDS  # one sampled frame per Hamming band
_VFP_GRID = 4  # 16 bits per frame


def video_fingerprint_bytes(raw: bytes) -> int | None:
    """Signed-64-bit temporal fingerprint of an MJPEG-AVI payload; None for
    containers whose sampled frames all fail to decode."""
    from .jpeg import decode_avi, decode_jpeg

    frames = decode_avi(raw)["frames"]
    n = len(frames)
    idxs = [(i * (n - 1)) // (_VFP_FRAMES - 1) for i in range(_VFP_FRAMES)] if n > 1 else [0] * _VFP_FRAMES
    bits: list[bool] = []
    for ix in idxs:
        px = decode_jpeg(frames[ix])["pixels"]
        sub = ahash_pixels(px, grid=_VFP_GRID)  # 16 bits in the low half
        bits.extend(bool((sub >> b) & 1) for b in range(_VFP_GRID * _VFP_GRID - 1, -1, -1))
    return _pack_bits_signed64(np.asarray(bits))


def media_video_fingerprint(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """Video fingerprint stage: temporal aHash over decodable MJPEG AVIs.
    Same ``ahash`` column contract as :func:`media_ahash` /
    :func:`media_audio_fingerprint`, so :func:`phash_near_pairs` pairs
    videos unchanged."""
    return _media_hash_stage(df, "avi", video_fingerprint_bytes, data_col, id_col)


# --- real-file ingestion: a media directory -> the media-table contract --------------

# extension -> kind routing for directory ingestion; anything unknown lands
# as 'other' so a stray file never silently masquerades as decodable media
MEDIA_EXT_KINDS = {
    "wav": "audio",
    "ppm": "image",
    "gif": "image",
    "png": "image",
    "jpg": "image",
    "jpeg": "image",
    "mp4": "video",
    "mkv": "video",
    "avi": "video",
}


def read_media_dir(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of real media files into the media-table contract
    (media_id, kind, data, meta) via Spark's built-in ``binaryFile`` source —
    the missing first mile before :func:`decode_media_typed` /
    :func:`resize_media` / :func:`sample_frames`, which until round 5 only
    ever saw payloads synthesized from the documents fixture.

    - ``media_id`` = 60-bit hash of the file path (deterministic across
      runs and cluster sizes; no window/zipWithIndex — an id assignment that
      needed a global ordering would serialize the scan).
    - ``kind`` routes by extension (MEDIA_EXT_KINDS, unknown -> 'other');
      content-sniffing stays in codecs.sniff_format at decode time.
    - ``meta`` carries the source facts (path, byte length, mtime).

    Scale: binaryFile parallelizes by FILE — each row is one file's bytes,
    so a 100 TB media corpus of small files wants the same medicine as any
    small-files problem (compact into larger archives, or raise
    ``spark.sql.files.maxPartitionBytes`` so Spark bundles many files per
    task); files over 2 GB exceed the source's single-row limit and should
    ship as chunked rows instead. Filters on path/length push into the
    source (PushedFilters), so kind-scoped reads prune before bytes move.
    """
    from ..functions.hashing import h60

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    kind_map = F.create_map(
        *[F.lit(x) for kv in MEDIA_EXT_KINDS.items() for x in kv]
    )
    return files.select(
        h60(F.col("path")).alias("media_id"),
        F.coalesce(kind_map[ext], F.lit("other")).alias("kind"),
        F.col("content").alias("data"),
        F.struct(
            F.col("path").alias("path"),
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("mtime"),
        ).alias("meta"),
    )


def sample_frames_real(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """Format-aware frame sampling: MJPEG-AVI payloads yield REAL frames —
    up to ``max_frames`` evenly spaced '00dc' JPEG chunks, each of which
    decodes standalone with ``codecs.decode_jpeg`` — while non-video-format
    payloads fall back to ``sample_frames``' byte-chunk arithmetic (the
    deterministic stand-in the fake path and its oracle replay).

    Same Arrow-batched ``mapInPandas`` contract and FRAME_SCHEMA as
    ``sample_frames``; selection is index-based (``linspace`` over frame
    numbers), the sampling rule every keyframe thumbnailer uses.
    """
    from .codecs import _DECODE_ERRORS, decode_avi, sniff_format

    frame_bytes = 64  # fallback chunk size, matching sample_frames' default

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(b)
                if sniff_format(raw) == "avi":
                    try:
                        all_frames = decode_avi(raw)["frames"]
                    except _DECODE_ERRORS:
                        all_frames = None
                    if all_frames:
                        n = min(max_frames, len(all_frames))
                        picks = [
                            int(round(i * (len(all_frames) - 1) / max(n - 1, 1)))
                            for i in range(n)
                        ]
                        for out_no, src_no in enumerate(picks):
                            ids.append(mid)
                            nos.append(out_no)
                            frames.append(all_frames[src_no])
                        continue
                n_chunks = -(-len(raw) // frame_bytes) if raw else 1
                for i in range(min(max_frames, max(1, n_chunks))):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.where(F.col("kind") == "video").mapInPandas(_frames, schema=FRAME_SCHEMA)


SPECTROGRAM_SCHEMA = "media_id bigint, feature array<float>"


def media_spectrogram(df: DataFrame, data_col: str = "data", id_col: str = "media_id") -> DataFrame:
    """Audio embedding stage: log-power spectrogram features over decodable
    WAV payloads (``codecs.spectrogram_features`` — Hann-windowed rFFT,
    8 frames × 8 bands, mean-centered so EXACTLY gain-invariant). Output is
    a fixed float32[64] vector per clip — the same shape as the embeddings
    table, so the ANN / near-dup / k-means operators consume it unchanged
    (audio near-dup = this stage + ``blockjoin``'s cosine machinery).
    Non-WAV payloads yield null. Arrow-batched; binaries never leave the
    stage."""
    from .codecs import decode_wav, sniff_format, spectrogram_features

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[data_col]:
                raw = bytes(b)
                if sniff_format(raw) == "wav":
                    try:
                        feats.append(spectrogram_features(decode_wav(raw)["samples"]).tolist())
                    except Exception:
                        feats.append(None)
                else:
                    feats.append(None)
            yield pd.DataFrame({id_col: pdf[id_col].values, "feature": feats})

    return df.mapInPandas(_feat, schema=SPECTROGRAM_SCHEMA)


MOTION_SCHEMA = (
    "media_id bigint, n_frames int, mean_motion double, max_motion double, n_cuts int"
)


def video_motion_scores(
    df: DataFrame,
    max_frames: int = 8,
    cut_threshold: float = 30.0,
    data_col: str = "data",
    id_col: str = "media_id",
) -> DataFrame:
    """Video motion/scene-cut stage over MJPEG-AVI payloads: sample up to
    ``max_frames`` evenly spaced frames, decode each (real JPEG decode),
    score consecutive-frame motion as mean |pixel delta| and count scene
    cuts (motion above ``cut_threshold``) — the shot-boundary heuristic a
    video curation pipeline thresholds on. Non-AVI payloads yield null
    scores. Arrow-batched; frames never leave the stage."""
    from .codecs import _DECODE_ERRORS, decode_avi, decode_jpeg, sniff_format

    def _motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_frames": [], "mean_motion": [], "max_motion": [], "n_cuts": []}
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                raw = bytes(b)
                vals = (None, None, None, None)
                if sniff_format(raw) == "avi":
                    try:
                        frames = decode_avi(raw)["frames"]
                        n = min(max_frames, len(frames))
                        picks = [
                            int(round(i * (len(frames) - 1) / max(n - 1, 1))) for i in range(n)
                        ]
                        px = [decode_jpeg(frames[i])["pixels"].astype(np.float64) for i in picks]
                        diffs = [
                            float(np.abs(a - c).mean()) for a, c in zip(px, px[1:])
                        ]
                        if diffs:
                            vals = (
                                n,
                                float(np.mean(diffs)),
                                float(np.max(diffs)),
                                int(sum(d > cut_threshold for d in diffs)),
                            )
                        else:
                            vals = (n, 0.0, 0.0, 0)
                    except _DECODE_ERRORS:
                        pass
                rows["media_id"].append(mid)
                rows["n_frames"].append(vals[0])
                rows["mean_motion"].append(vals[1])
                rows["max_motion"].append(vals[2])
                rows["n_cuts"].append(vals[3])
            out = pd.DataFrame(rows)
            out["n_frames"] = out["n_frames"].astype("Int32")
            out["n_cuts"] = out["n_cuts"].astype("Int32")
            yield out

    return df.mapInPandas(_motion, schema=MOTION_SCHEMA)
