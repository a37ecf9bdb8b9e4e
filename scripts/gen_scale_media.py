"""Seeded media-table generator for the SCALING.md §8b media curves.

Real codec payloads (spatially-correlated images with a randomized per-cell
component): 90% PPM + 10% baseline JPEG encoded by this repo's own
encoders, ~10% planted near-duplicates (uniform brightness shift of a
recent image — aHash-invariant, so the pair stage has real work) and ~2%
exact duplicates. Deterministic per (n, seed).

Usage: python scripts/gen_scale_media.py --n 2000 --out /tmp/scale/media_2000.parquet
(never writes to /root/testdata; see SCALING.md §8b for the harness recipe:
decode → aHash → banded-Hamming pairs over n = 2000 / 8000 / 32000.)
"""
import argparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_etl_loadtest_spark.operators.codecs import encode_ppm
from clickhouse_etl_loadtest_spark.operators.jpeg import encode_jpeg


def smooth_img(rng, h=32, w=32):
    y = np.arange(h)[:, None] / h
    x = np.arange(w)[None, :] / w
    fy, fx = rng.integers(1, 5, size=2)
    phase = rng.uniform(0, 2 * np.pi, size=(3, 2))
    base = np.stack(
        [128 + 60 * np.sin(2 * np.pi * fy * y + phase[c, 0])
         + 60 * np.cos(2 * np.pi * fx * x + phase[c, 1]) for c in range(3)],
        axis=2,
    )
    noise = rng.normal(0, 8, size=(h, w, 3))
    # Per-cell blocky component aligned with aHash's 8x8 grid: without it the
    # small frequency palette collapses thousands of images onto a handful of
    # aHashes, and the pair stage measures accidental-collision blow-up
    # (quadratic output) instead of the pipeline. With it, non-duplicate
    # hashes are effectively random 64-bit draws (P[Hamming<=3] ~ 2e-15) and
    # output volume is set by the planted ~12% dup rate — linear in rows.
    # amplitude split: blocky must dominate the correlated sinusoid or the
    # 64 hash bits carry only ~13 effective bits (measured: P[collision
    # within Hamming 3] ~ 1e-4 -> a quadratic accidental-pair term)
    blocky = np.kron(rng.integers(-90, 91, size=(8, 8, 3)), np.ones((h // 8, w // 8, 1)))
    return np.clip(127 + (base - 127) * 0.4 + blocky + noise, 20, 235).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    ids, payloads = [], []
    recent = []  # (pixels, is_jpeg)
    for i in range(args.n):
        r = rng.random()
        if recent and r < 0.02:  # exact duplicate
            px, use_jpeg = recent[rng.integers(0, len(recent))]
        elif recent and r < 0.12:  # near-duplicate: brightness shift
            src, use_jpeg = recent[rng.integers(0, len(recent))]
            px = np.clip(src.astype(np.int16) + int(rng.integers(-10, 11)), 0, 255).astype(np.uint8)
        else:
            px = smooth_img(rng)
            use_jpeg = rng.random() < 0.10
        recent.append((px, use_jpeg))
        if len(recent) > 50:
            recent.pop(0)
        ids.append(i)
        payloads.append(encode_jpeg(px) if use_jpeg else encode_ppm(px))
    t = pa.table({"media_id": pa.array(ids, pa.int64()), "data": pa.array(payloads, pa.binary())})
    pq.write_table(t, args.out)
    print(f"wrote {args.n} payloads -> {args.out}")


if __name__ == "__main__":
    main()
