"""Capture .explain("formatted") for driver queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag-dir> [before|after] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: the
bench headline set). Mostly plan-only, but queries whose CONSTRUCTOR calls
localCheckpoint (the margin_mutual_best family, semdedup, release stacks)
eagerly run real Spark jobs during capture (r13 ADVICE) — don't run this
beside timed measurements.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.session import get_spark

    registry = load_all()
    names = sys.argv[3:] or [n for n, q in sorted(registry.items()) if q.headline]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        q = registry[name]
        buf = io.StringIO()
        with redirect_stdout(buf):
            q.fn(spark, sf_dir).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
