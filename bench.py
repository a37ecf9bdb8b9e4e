"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver
(BENCH_r{N}.json).

Metric formulas follow the reference for comparability (BASELINE.md):
``rps = n_rows_processed / elapsed`` per query, plus total wall time.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.session import get_spark

    registry = load_all()
    headline = {name: q for name, q in sorted(registry.items()) if q.headline}

    spark = get_spark(app_name="bench")
    # JVM + codegen warmup so per-query timings measure the plan, not startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, q in headline.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()  # forces full execution; avoids toPandas transfer cost
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
