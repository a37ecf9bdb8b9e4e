"""Time individual registry queries: 1 cold + N warm runs, median reported.

Usage: python scripts/timeq.py <name> [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), TIMEQ_WARM (default 5),
     TIMEQ_NOOP=1 to use the noop sink instead of count() (guide §1.4).

Same methodology as bench.py's queries section (count() action) so numbers
are comparable with BENCH_r*.json; the noop mode exists to check that a
count()-measured win is not an artifact of column pruning.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = int(os.environ.get("TIMEQ_WARM", "5"))
    noop = os.environ.get("TIMEQ_NOOP", "0") == "1"
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="timeq")
    spark.range(10_000).selectExpr("sum(id)").collect()

    def run(df) -> None:
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for name in sys.argv[1:]:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"timeq: {name}")
        t0 = time.perf_counter()
        run(q.fn(spark, sf_dir))
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(warm):
            t0 = time.perf_counter()
            run(q.fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: cold {cold:.3f}s warm median {statistics.median(runs):.3f}s "
            f"runs {[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
