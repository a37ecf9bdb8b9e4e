"""Per-stage executor-CPU profile for individual registry queries.

Usage: python scripts/profq.py <name> [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PROFQ_WARM (default 2 — runs before
     the measured one so codegen/JIT don't land in the profile).

For each query: run warm-ups, then one measured run with the Spark UI REST
API bracketing it; print the new completed stages sorted by executorRunTime
with their shuffle read/write bytes and task counts. Measurement-only — no
engine behavior changes (same family as scripts/timeq.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(spark) -> dict[int, dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = int(os.environ.get("PROFQ_WARM", "2"))
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="profq", extra_conf={"spark.ui.enabled": "true"})
    spark.range(10_000).selectExpr("sum(id)").collect()

    for name in sys.argv[1:]:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"profq-warm: {name}")
        for _ in range(warm):
            q.fn(spark, sf_dir).count()
        before = _stages(spark)
        spark.sparkContext.setJobDescription(f"profq: {name}")
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        new = [s for sid, s in _stages(spark).items() if sid not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        total_cpu = sum(s.get("executorRunTime", 0) for s in new)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages, "
              f"executorRunTime sum {total_cpu} ms ===")
        for s in new:
            print(
                f"  stage {s['stageId']:>5} run {s.get('executorRunTime', 0):>7} ms "
                f"cpu {s.get('executorCpuTime', 0) // 1_000_000:>7} ms "
                f"tasks {s.get('numCompleteTasks', 0):>3} "
                f"in {s.get('inputBytes', 0):>10} sh_r {s.get('shuffleReadBytes', 0):>9} "
                f"sh_w {s.get('shuffleWriteBytes', 0):>9}  {s.get('name', '')[:80]}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
