"""Z-order layout (operators/layout.py): correctness + measured pruning.

The point of z-ordering is that row-group min/max stats become selective on
EVERY indexed column. We verify that directly: write the same data naive vs
z-ordered, then measure what fraction of row groups a single-column range
predicate could skip from footer stats alone, per column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.layout import zorder_value, zorder_write


def _df(spark, n=40_000):
    """Two independent uniform columns — worst case for single-key sorting,
    the case z-order exists for."""
    return spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
    )


def _groups_matching(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(row groups whose [min,max] intersects [lo,hi], total row groups)."""
    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        for g in range(pf.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                touched += 1
    return touched, total


def test_zorder_preserves_rows(spark, tmp_path):
    df = _df(spark, 5000)
    out = str(tmp_path / "z")
    zorder_write(df, out, ["a", "b"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 5000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    df = _df(spark)
    naive = str(tmp_path / "naive")
    zpath = str(tmp_path / "z")
    # 16 KB row groups -> ~32 groups over 40k rows: enough stat granularity
    # that the touched fraction is not quantized to multiples of 1/16 (at
    # 64 KB the fraction for the least-significant interleaved column sat
    # exactly on the old 0.5 threshold and flapped with approxQuantile's
    # partition-order-dependent cuts)
    opts = {"parquet.block.size": 16 * 1024, "parquet.page.size": 4096}
    w = df.repartition(8).write.mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(naive)  # naive baseline: same file count, arbitrary (hash) distribution
    zorder_write(df, zpath, ["a", "b"], n_files=8, writer_options=opts)

    fracs = {}
    for col in ("a", "b"):
        nt, ntot = _groups_matching(naive, col, 100, 150)  # ~2.5% selectivity
        zt, ztot = _groups_matching(zpath, col, 100, 150)
        naive_frac, z_frac = nt / ntot, zt / ztot
        # naive layout: essentially every group matches
        assert naive_frac > 0.9, (col, naive_frac)
        fracs[col] = z_frac / naive_frac
    # z-order: EVERY indexed column prunes (Morton bit order makes the
    # later-listed column prune harder — both must still beat naive), and
    # the average across columns is a clear minority of row groups
    for col, f in fracs.items():
        assert f < 0.75, (col, fracs)
    assert sum(fracs.values()) / len(fracs) < 0.45, fracs


def test_zorder_value_is_repeatable_and_jvm_side(spark):
    """Same input partitioning -> identical z-values (approxQuantile cuts
    are sketch-merged in partition order, so cuts — and therefore the
    LAYOUT, never the data — can shift across repartitionings; documented
    in zorder_value). The z expression itself must stay in codegen."""
    df = _df(spark, 2000)
    z1 = zorder_value(df, ["a", "b"]).select("id", "_z")
    z2 = zorder_value(df, ["a", "b"]).select("id", "_z")
    assert z1.exceptAll(z2).count() == 0
    plan = z1._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_zorder_validates_column_count(spark):
    with pytest.raises(ValueError):
        zorder_value(_df(spark, 10), ["a"])
