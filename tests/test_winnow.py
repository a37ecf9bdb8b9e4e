"""Winnowing (Schleimer et al. 2003): the selection guarantee — any verbatim
overlap of >= k + w - 1 tokens shares at least one selected fingerprint —
must hold on constructed documents, and the density must sit near the
2/(w+1) theory value on the fixtures."""

import numpy as np
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.queries.curation import (
    _WINNOW_K,
    _WINNOW_W,
    _winnow_selected,
)


def _docs_df(spark, texts):
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def _selected_for(spark, tmp_path, texts):
    df = _docs_df(spark, texts)
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return _winnow_selected(spark, str(tmp_path))


def test_guarantee_shared_span_shares_a_fingerprint(spark, tmp_path):
    """Plant a k+w-1-token verbatim span inside two otherwise-different
    documents: winnowing MUST select a common fingerprint from it."""
    rng = np.random.default_rng(17)
    span = " ".join(f"shared{j}" for j in range(_WINNOW_K + _WINNOW_W - 1))
    noise = lambda n: " ".join(f"w{rng.integers(0, 10**9)}" for _ in range(n))  # noqa: E731
    texts = [
        f"{noise(30)} {span} {noise(30)}",
        f"{noise(25)} {span} {noise(35)}",
        noise(60),  # control: no planted span
    ]
    sel = _selected_for(spark, tmp_path, texts)
    fps = {
        d: {r["fp_hash"] for r in rows}
        for d, rows in (
            (d, sel.where(F.col("doc_id") == d).collect()) for d in (0, 1, 2)
        )
    }
    assert fps[0] & fps[1], "guarantee violated: shared span selected no common fingerprint"
    # the control shares nothing with either planted doc (random 9-digit words)
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_density_near_theory(spark, sf_dir):
    """E[selected/grams] = 2/(w+1) for random hashes; the fixture corpus
    must land in a generous band around it."""
    from clickhouse_etl_loadtest_spark.queries import load_all

    rows = load_all()["doc_winnow_fingerprints"].fn(spark, sf_dir).collect()
    density = sum(r["n_selected"] for r in rows) / sum(r["n_grams"] for r in rows)
    theory = 2.0 / (_WINNOW_W + 1)
    assert 0.6 * theory <= density <= 1.6 * theory, (density, theory)


def test_rolling_min_window_partitions_by_doc(spark, sf_dir):
    plan = _winnow_selected(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines
    for ln in window_lines:
        assert "doc_id#" in ln, ln
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
