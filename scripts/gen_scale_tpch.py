"""sf1.0-equivalent TPC-H-ish fixtures by tiling the driver's sf0.1 tables.

The official bench gate runs at sf0.1 (TESTDATA.md); the scaling-curve
fixtures (`gen_scale_docs.py`) extend only documents/embeddings. This
generator extends the RELATIONAL tables so the headline analytics queries
(Q1/Q3/Q5 shapes) can run at 10× the gate scale: each copy `i` of the sf0.1
data gets every join key offset by `i * stride` (strides are key-space
sized), so the tiled corpus is a union of 10 internally-consistent
sub-databases — join fan-out, group cardinalities and date distributions
scale exactly like TPC-H does between scale factors (dimension tables grow
10×, nation/region stay fixed, selectivities are unchanged).

Deterministic: pure key arithmetic over the driver's seeded tables — no RNG
at all. Never writes to /root/testdata.

Usage: python scripts/gen_scale_tpch.py --copies 10 --out /tmp/scale/sf1.0
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# per-copy key strides: comfortably above each key's max in sf0.1
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "suppkey": 10_000,
    "partkey": 100_000,
}


def tile_sql(table: str, copies: int) -> str:
    """UNION-by-copy SQL with offset keys; copy 0 is the original data."""
    offsets = {
        "lineitem": {
            "l_orderkey": "orderkey",
            "l_partkey": "partkey",
            "l_suppkey": "suppkey",
        },
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "customer": {"c_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "part": {"p_partkey": "partkey"},
        "events": {},  # event_id/user_id are uuid-shaped strings: suffix them
    }[table]
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{SRC}/{table}.parquet') LIMIT 0"
    ).columns
    parts = []
    for i in range(copies):
        sel = []
        for c in cols:
            if c in offsets:
                sel.append(f"{c} + {i * STRIDES[offsets[c]]} AS {c}")
            elif table == "events" and c in ("event_id", "user_id") and i > 0:
                sel.append(f"{c} || '-t{i}' AS {c}")
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} FROM read_parquet('{SRC}/{table}.parquet')"
        )
    return " UNION ALL ".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale/sf1.0")
    args = ap.parse_args()
    assert not args.out.startswith("/root/testdata"), "never write to the driver fixtures"
    os.makedirs(args.out, exist_ok=True)

    for table in ("lineitem", "orders", "customer", "supplier", "part", "events"):
        duckdb.sql(
            f"COPY ({tile_sql(table, args.copies)}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n:,} rows")
    for table in ("nation", "region"):  # fixed-cardinality dims: copy as-is
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")


if __name__ == "__main__":
    main()
