"""3-run isolated probe for the 20M streaming dedup wave.

Round-10's official bench put the wave at 33.3 s raw (update_time_ms_sum
555 s) vs round-9's 18.8 s (441 s) — past the 30 s watch. Both runs sat
inside a FULL bench process (long-lived JVM, page cache warmed by every
prior wave), so this probe answers the standing instruction from the
round-9 verdict: run the wave N times in FRESH isolated processes with
full RocksDB counters (memtable flushes, compactions, stall time, JNI
get/put latencies) and commit the comparison.

Each child is its own JVM via ``clickhouse_etl_loadtest_spark.session
.get_spark`` — identical confs to the official wave — and burns three
calibration rounds before recording one (fresh-JVM C2 warm-up reads the
yardstick 2-3x high for the first minute; trusting the first bracket
would "normalize" the wave against a fiction).

Usage: ``python scripts/probe_stream20m.py [n_runs]`` from the repo root;
writes STREAM_PROBE.json and prints a comparison table. ``--child`` is
the internal per-run entry point.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# committed reference points (BENCH_PROFILE.json at the named commits)
HISTORY = {
    "r9_driver (928d072)": {"duration_sec": 18.8, "update_time_ms_sum": 440_752,
                            "commit_time_ms_sum": 2_193, "stream_calib": 1.373},
    "r10_builder (56180e3)": {"duration_sec": 26.5, "update_time_ms_sum": 629_240,
                              "commit_time_ms_sum": 1_436, "stream_calib": None},
    "r10_driver (650856c)": {"duration_sec": 33.3, "update_time_ms_sum": 555_271,
                             "commit_time_ms_sum": 1_897, "stream_calib": 1.498},
}


def child() -> None:
    sys.path.insert(0, REPO)
    os.environ["SPARK_GRAFT_STATE_METRICS_FULL"] = "1"
    import bench
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark(app_name="probe-stream20m")
    spark.range(10_000).selectExpr("sum(id)").collect()  # JVM/codegen warmup
    burn = [bench.calibration(spark, n_runs=1) for _ in range(3)]
    calib = bench.calibration(spark)
    r = bench.run_streaming_loadtest(spark, total_records=20_000_000, state_metrics=True)
    r["calib_sec"] = calib
    r["calib_burnin"] = [round(b, 3) for b in burn]
    r["loadavg_after_wave"] = list(os.getloadavg())
    sys.stdout.write("\nPROBE " + json.dumps(r) + "\n")
    sys.stdout.flush()
    spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    runs = []
    for i in range(n):
        print(f"# probe run {i + 1}/{n} (fresh process)", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, cwd=REPO, timeout=2400,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("PROBE ")]
        if not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"probe child {i} produced no PROBE line")
        runs.append(json.loads(line[-1][6:]))

    walls = [r["duration_sec"] for r in runs]
    upds = [r["state_store"]["update_time_ms_sum"] for r in runs]
    summary = {
        "n_runs": n,
        "wall_sec": walls,
        "wall_median_sec": round(statistics.median(walls), 1),
        "update_time_ms_sum": upds,
        "update_time_median_ms": int(statistics.median(upds)),
        "calib_sec": [r["calib_sec"] for r in runs],
        "history": HISTORY,
        "runs": runs,
    }
    with open(os.path.join(REPO, "STREAM_PROBE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("wall_sec", "wall_median_sec", "update_time_ms_sum",
                       "update_time_median_ms", "calib_sec")}, indent=1))


if __name__ == "__main__":
    child() if "--child" in sys.argv else main()
