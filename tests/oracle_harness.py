"""Self-check harness mimicking the driver's DuckDB-oracle comparison:
row-count + schema + order-insensitive value hash (see __spark_entry__.py
docstring and FIXTURES.md canonicalization rules: sort columns by name, round
doubles to 9 significant digits, ISO-format timestamps, sort rows)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _round_sig(x, sig=9):
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None  # NaN != NaN would false-fail tuple comparison
    if isinstance(x, float) and math.isinf(x):
        return x
    if x == 0:
        return 0.0
    return float(f"%.{sig - 1}e" % x)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    rows = []
    for row in df.itertuples(index=False):
        canon = []
        for v in row:
            if v is pd.NaT:
                canon.append(None)
            elif isinstance(v, float):
                canon.append(_round_sig(v))
            elif isinstance(v, pd.Timestamp):
                canon.append(v.isoformat())
            elif hasattr(v, "isoformat"):
                canon.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon.append(tuple(_round_sig(float(x)) for x in v))
            else:
                canon.append(v)
        rows.append(tuple(canon))
    return sorted(rows, key=repr)


def compare_query(spark, sf_dir: str, fn, oracle_sql: str) -> tuple[bool, str]:
    """Run Spark query + DuckDB oracle, compare canonicalized results."""
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    duck_pdf = con.sql(oracle_sql).df()
    con.close()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(spark_pdf)} rows)"
