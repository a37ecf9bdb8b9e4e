"""Seeded documents + embeddings generator for scaling-curve smokes.

The driver fixtures stop at sf0.1 (5,000 docs / 2,000 vectors); the 100 TB
claims in SCALING.md rest on plan shape unless wall-vs-rows is MEASURED
past that. This generator extends the same table shapes to arbitrary sf
(docs = 50_000 * sf, vectors = 20_000 * sf — the fixtures' densities) with
the structural features the heavy operators feed on at every scale:

- Zipf-ish token draws from a small fixed vocab (matches the fixtures'
  ~40-word data-engineering vocabulary, mean ~60 tokens/doc),
- ~10% near-duplicate docs (5% token mutation of a recent doc) and ~1%
  exact duplicates, so MinHash banding / repeated spans / LSH candidate
  volume scale the way a real dup-bearing corpus does,
- 8-cluster Gaussian embeddings with ~2% near-duplicate vectors for the
  blocked-matmul near-dup join.

Deterministic per (sf, seed): numpy PCG64 with a fixed seed — reruns are
bit-identical, so curve points are comparable across sessions.

Usage: python scripts/gen_scale_docs.py --sf 0.3 --out /tmp/scale/sf0.3
(never writes to /root/testdata).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark line column order small sort fast value scan hash slow group agg "
    "filter batch part query table stream join merge window key data row the "
    "a big vector customer region nation supplier cost price item node shard"
).split()
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
N_SOURCES = 20


def gen_documents(sf: float, seed: int = 42) -> pa.Table:
    n = int(round(50_000 * sf))
    rng = np.random.default_rng(seed)
    zipf_p = 1.0 / np.arange(1, len(VOCAB) + 1)
    zipf_p /= zipf_p.sum()
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.01:  # exact duplicate of a recent doc
            texts.append(texts[i - int(rng.integers(1, min(i, 1000)))])
            continue
        if i > 10 and r < 0.11:  # near-duplicate: ~5% token mutation
            base = texts[i - int(rng.integers(1, min(i, 1000)))].split()
            toks = [
                VOCAB[int(rng.integers(len(VOCAB)))] if rng.random() < 0.05 else w
                for w in base
            ]
        else:
            n_tok = int(rng.integers(10, 111))
            toks = [VOCAB[j] for j in rng.choice(len(VOCAB), size=n_tok, p=zipf_p)]
        texts.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[x] for x in langs], pa.string()),
            "source": pa.array([f"src{i % N_SOURCES}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(sf: float, dim: int = 64, seed: int = 43) -> pa.Table:
    n = int(round(20_000 * sf))
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, size=(8, dim))
    labels = rng.integers(0, 8, size=n)
    vecs = centers[labels] + 0.1 * rng.normal(0, 1, size=(n, dim))
    for i in range(1, n):  # ~2% near-duplicate vectors
        if rng.random() < 0.02:
            j = i - int(rng.integers(1, min(i, 500) + 1))
            vecs[i] = vecs[j] + 1e-4 * rng.normal(0, 1, size=dim)
            labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs.astype(np.float32).tolist(), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(gen_documents(args.sf), f"{args.out}/documents.parquet")
    pq.write_table(gen_embeddings(args.sf), f"{args.out}/embeddings.parquet")
    print(f"wrote sf={args.sf} -> {args.out}")


if __name__ == "__main__":
    main()
