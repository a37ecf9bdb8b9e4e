"""Generic as-of join operator tests (operators/asof.py): backward/forward,
exact-match control, tolerance, and DuckDB ASOF JOIN equivalence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.asof import asof_join

TS = "2024-01-01 00:{m:02d}:00"


def _frames(spark):
    quotes = spark.createDataFrame(
        [("A", TS.format(m=1), 10.0), ("A", TS.format(m=5), 11.0), ("B", TS.format(m=2), 20.0)],
        "sym string, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    trades = spark.createDataFrame(
        [("A", TS.format(m=0), 100), ("A", TS.format(m=5), 200), ("A", TS.format(m=9), 300), ("B", TS.format(m=3), 400), ("C", TS.format(m=4), 500)],
        "sym string, ts string, qty int",
    ).withColumn("ts", F.to_timestamp("ts"))
    return trades, quotes


def test_backward_exact(spark):
    trades, quotes = _frames(spark)
    out = {(r["sym"], r["qty"]): r for r in asof_join(trades, quotes, "sym", right_cols=["px"]).collect()}
    assert out[("A", 100)]["px_asof"] is None  # trade before any quote
    assert out[("A", 200)]["px_asof"] == 11.0  # exact-ts quote matches
    assert out[("A", 300)]["px_asof"] == 11.0
    assert out[("B", 400)]["px_asof"] == 20.0
    assert out[("C", 500)]["px_asof"] is None  # no quotes for key at all


def test_backward_strict(spark):
    trades, quotes = _frames(spark)
    out = {
        (r["sym"], r["qty"]): r
        for r in asof_join(trades, quotes, "sym", right_cols=["px"], allow_exact_matches=False).collect()
    }
    assert out[("A", 200)]["px_asof"] == 10.0  # equal-ts quote excluded


def test_forward(spark):
    trades, quotes = _frames(spark)
    out = {
        (r["sym"], r["qty"]): r
        for r in asof_join(trades, quotes, "sym", right_cols=["px"], direction="forward").collect()
    }
    assert out[("A", 100)]["px_asof"] == 10.0  # next quote at :01
    assert out[("A", 300)]["px_asof"] is None  # nothing after :09


def test_tolerance(spark):
    trades, quotes = _frames(spark)
    out = {
        (r["sym"], r["qty"]): r
        for r in asof_join(trades, quotes, "sym", right_cols=["px"], tolerance_seconds=120).collect()
    }
    assert out[("A", 300)]["px_asof"] is None  # :05 quote is 4 min old > 2 min
    assert out[("B", 400)]["px_asof"] == 20.0  # 1 min old


def test_matches_duckdb_asof(spark):
    """Differential check against DuckDB's native ASOF JOIN on a bigger input."""
    trades, quotes = _frames(spark)
    got = sorted(
        (r["sym"], r["qty"], r["px_asof"])
        for r in asof_join(trades, quotes, "sym", right_cols=["px"]).collect()
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE trades AS SELECT * FROM (VALUES ('A', TIMESTAMP '2024-01-01 00:00:00', 100), ('A', TIMESTAMP '2024-01-01 00:05:00', 200), ('A', TIMESTAMP '2024-01-01 00:09:00', 300), ('B', TIMESTAMP '2024-01-01 00:03:00', 400), ('C', TIMESTAMP '2024-01-01 00:04:00', 500)) t(sym, ts, qty)")
    con.sql("CREATE TABLE quotes AS SELECT * FROM (VALUES ('A', TIMESTAMP '2024-01-01 00:01:00', 10.0), ('A', TIMESTAMP '2024-01-01 00:05:00', 11.0), ('B', TIMESTAMP '2024-01-01 00:02:00', 20.0)) q(sym, ts, px)")
    want = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT t.sym, t.qty, q.px FROM trades t ASOF LEFT JOIN quotes q ON t.sym = q.sym AND t.ts >= q.ts"
        ).fetchall()
    )
    assert got == want


def test_rejects_bad_direction(spark):
    trades, quotes = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(trades, quotes, "sym", direction="sideways")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_asof_matches_duckdb_property(data):
    """Property-based differential: random (key, ts) streams must match
    DuckDB's native ASOF LEFT JOIN exactly, both directions."""
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark()
    n_left = data.draw(st.integers(5, 40))
    n_right = data.draw(st.integers(0, 40))
    keys = ["A", "B", "C"]
    mk = lambda i, n: [  # noqa: E731
        (data.draw(st.sampled_from(keys)), data.draw(st.integers(0, 50)), i * 1000 + j)
        for j in range(n)
    ]
    lrows, rrows = mk(1, n_left), mk(2, n_right)

    left = spark.createDataFrame([(k, float(t), v) for k, t, v in lrows], "k string, ts double, lv long")
    right = spark.createDataFrame([(k, float(t), v) for k, t, v in rrows], "k string, ts double, rv long") if rrows else spark.createDataFrame([], "k string, ts double, rv long")

    got = sorted(
        (r["k"], r["ts"], r["lv"], r["rv_asof"])
        for r in asof_join(left, right, "k", left_ts="ts", right_cols=["rv"]).collect()
    )

    con = duckdb.connect()
    con.sql("CREATE TABLE l (k VARCHAR, ts DOUBLE, lv BIGINT)")
    con.sql("CREATE TABLE r (k VARCHAR, ts DOUBLE, rv BIGINT)")
    for k, t, v in lrows:
        con.sql(f"INSERT INTO l VALUES ('{k}', {t}, {v})")
    for k, t, v in rrows:
        con.sql(f"INSERT INTO r VALUES ('{k}', {t}, {v})")
    # DuckDB ASOF picks an arbitrary row among right ties; make ties impossible
    # by deduping right to max rv per (k, ts) in BOTH engines' inputs... our
    # operator picks max rv deterministically, so dedupe the oracle the same way
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            WITH rd AS (SELECT k, ts, MAX(rv) AS rv FROM r GROUP BY k, ts)
            SELECT l.k, l.ts, l.lv, rd.rv
            FROM l ASOF LEFT JOIN rd ON l.k = rd.k AND l.ts >= rd.ts
            """
        ).fetchall()
    )
    assert got == want


def test_shared_payload_column_name(spark):
    """Regression: a right_cols name that also exists on the left must not
    corrupt either side (both used to be nulled by the schema-align loops)."""
    trades, quotes = _frames(spark)
    trades_px = trades.withColumn("px", F.col("qty") * 1.0)  # left has its own px
    out = {r["qty"]: r for r in asof_join(trades_px, quotes, "sym", right_cols=["px"]).collect()}
    assert out[400]["px"] == 400.0  # left's own px intact
    assert out[400]["px_asof"] == 20.0  # right payload carried
    assert out[100]["px"] == 100.0 and out[100]["px_asof"] is None


def test_suffix_collision_rejected(spark):
    trades, quotes = _frames(spark)
    trades_bad = trades.withColumn("px_asof", F.lit(0.0))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collides"):
        asof_join(trades_bad, quotes, "sym", right_cols=["px"])


def test_tolerance_on_numeric_timestamps(spark):
    """Regression: tolerance used unix_micros unconditionally and blew up on
    double ts columns (which the join path supports)."""
    left = spark.createDataFrame([("A", 10.0, 1), ("A", 100.0, 2)], "k string, ts double, lv int")
    right = spark.createDataFrame([("A", 8.0, 7)], "k string, ts double, rv int")
    out = {r["lv"]: r for r in asof_join(left, right, "k", right_cols=["rv"], tolerance_seconds=5).collect()}
    assert out[1]["rv_asof"] == 7  # 2s old: within tolerance
    assert out[2]["rv_asof"] is None  # 92s old: nulled


def test_tolerance_boundary_is_exact_integer_micros(spark):
    """A left-right gap EXACTLY equal to the tolerance must be kept — and
    via integer-microsecond comparison, the same boundary rule the streaming
    compile path applies (double-seconds arithmetic rounds ~1e-7 s at 2024
    epochs, enough to flip this case between execution modes)."""
    left = spark.createDataFrame(
        [("A", "2024-06-01 00:02:00.000001", 1), ("A", "2024-06-01 00:02:00.000002", 2)],
        "k string, ts string, lv int",
    ).selectExpr("k", "cast(ts as timestamp) ts", "lv")
    right = spark.createDataFrame(
        [("A", "2024-06-01 00:00:00.000001", 7)], "k string, ts string, rv int"
    ).selectExpr("k", "cast(ts as timestamp) ts", "rv")
    out = {
        r["lv"]: r
        for r in asof_join(left, right, "k", right_cols=["rv"], tolerance_seconds=120).collect()
    }
    assert out[1]["rv_asof"] == 7  # gap == tolerance exactly: kept
    assert out[2]["rv_asof"] is None  # one microsecond past: nulled
