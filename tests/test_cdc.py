"""Content-defined chunking: the locality property that justifies the
operator. An insertion in the middle of a document must disturb only the
chunk(s) overlapping the edit — boundaries downstream re-synchronize because
they depend on content, not position — while fixed-stride chunking loses
every chunk after the edit to the position shift.

The value-level correctness of the manifest (positions, sizes, hashes) is
the DuckDB oracle's job (tests/test_query_oracles.py::doc_cdc_chunks); this
file pins the semantic contrast with ``doc_chunk_windows``.
"""

from __future__ import annotations

import random
from collections import Counter

from clickhouse_etl_loadtest_spark.queries import load_all

REGISTRY = load_all()


def _write_docs(spark, path: str, texts: list[str]) -> None:
    rows = [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _hashes(df, doc_id: int) -> Counter:
    return Counter(
        r["chunk_hash"] for r in df.collect() if r["doc_id"] == doc_id
    )


def test_insertion_locality_beats_fixed_stride(spark, tmp_path):
    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(200)]
    edited = words[:100] + ["inserted"] + words[100:]
    _write_docs(spark, str(tmp_path), [" ".join(words), " ".join(edited)])

    cdc = REGISTRY["doc_cdc_chunks"].fn(spark, str(tmp_path))
    c0, c1 = _hashes(cdc, 0), _hashes(cdc, 1)
    cdc_common = sum((c0 & c1).values())
    cdc_frac = cdc_common / max(sum(c0.values()), 1)

    stride = REGISTRY["doc_chunk_windows"].fn(spark, str(tmp_path))
    s0, s1 = _hashes(stride, 0), _hashes(stride, 1)
    stride_common = sum((s0 & s1).values())
    stride_frac = stride_common / max(sum(s0.values()), 1)

    # CDC: every chunk not overlapping the edit survives byte-identical —
    # at most the edited chunk and its boundary-adjacent neighbor change
    assert sum(c0.values()) >= 10  # the doc actually split into many chunks
    assert cdc_common >= sum(c0.values()) - 2
    # fixed stride: the +1 position shift invalidates every window that
    # starts at or after the insertion point
    assert cdc_frac > stride_frac


def test_single_token_doc_is_one_chunk(spark, tmp_path):
    _write_docs(spark, str(tmp_path), ["solo"])
    rows = REGISTRY["doc_cdc_chunks"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["chunk_idx"], r["start_pos"], r["n_chunk_tokens"]) == (1, 1, 1)


def test_chunks_partition_the_document(spark, tmp_path):
    """Chunks tile the token sequence exactly: starts/sizes are contiguous
    from position 1 through n with no gaps or overlaps."""
    rng = random.Random(11)
    n = 137
    _write_docs(spark, str(tmp_path), [" ".join(f"t{rng.randrange(99)}" for _ in range(n))])
    rows = sorted(
        REGISTRY["doc_cdc_chunks"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["chunk_idx"],
    )
    pos = 1
    for i, r in enumerate(rows):
        assert r["chunk_idx"] == i + 1
        assert r["start_pos"] == pos
        pos += r["n_chunk_tokens"]
    assert pos == n + 1
