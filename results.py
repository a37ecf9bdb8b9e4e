"""Results CSV analyzer — parity with the reference's ``results.py``
(/root/reference/results.py:86-103 entry, :37-84 display): read a results
CSV, strictly validate each row against the result model, and pretty-print
per-variant panels plus a cross-variant summary.

Usage:
    python results.py --results-file results/T_results.csv [--json]
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="load-test results analyzer")
    p.add_argument("--results-file", required=True)
    p.add_argument("--json", action="store_true", help="machine-readable output")
    return p.parse_args(argv)


def _fmt_ms(ms: float) -> str:
    return f"{ms / 1000:.1f}s" if ms >= 1000 else f"{ms:.1f}ms"


def display(rows: list[dict]) -> None:
    for r in rows:
        print(f"--- variant {r['variant_id']} ({'OK' if r['result_success'] else 'FAILED'}) ---")
        print(
            f"  params : records={r['param_total_records']:,} procs={r['param_num_processes']}"
            f" dup={r['param_duplication_rate']} window={r['param_deduplication_window']}"
            f" batch={r['param_max_batch_size']} delay={r['param_max_delay_time']}"
        )
        print(
            f"  volume : published={r['result_num_records']:,} uniques={r['result_total_generated']:,}"
            f" duplicates={r['result_total_duplicates']:,}"
        )
        print(
            f"  rates  : ingest={r['result_kafka_ingestion_rps']:,} rps"
            f" e2e={r['result_glassflow_rps']:,} rps"
            f" avg_latency={r['result_avg_latency_ms']:.4f}ms"
            f" lag={_fmt_ms(r['result_lag_ms'])}"
            f" wall={r['duration_sec']}s"
        )
    if rows:
        ok = sum(1 for r in rows if r["result_success"])
        best = max(rows, key=lambda r: r["result_glassflow_rps"])
        print(f"=== {ok}/{len(rows)} variants succeeded;"
              f" best e2e {best['result_glassflow_rps']:,} rps ({best['variant_id']}) ===")


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from clickhouse_etl_loadtest_spark.harness.metrics import TestResultsHandler

    rows = [r.model_dump() for r in TestResultsHandler(args.results_file).read_validated_results()]
    if args.json:
        print(json.dumps(rows, default=str))
    else:
        display(rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
