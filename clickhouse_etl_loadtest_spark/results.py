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
    """Per-variant bordered panels (Parameters/Results JSON body) + a summary
    line — the reference's display shape (results.py:37-84), rendered by the
    dependency-free panel/log helpers (harness/console.py)."""
    from clickhouse_etl_loadtest_spark.harness.console import log, panel, style, supports_color

    print(style("Test Results:", "blue", bold=True))
    print(style(f"Total Variants: {len(rows)}", "green", bold=True))
    for r in rows:
        body = json.dumps(
            {
                "Parameters": {
                    "Variant ID": r["variant_id"],
                    "Total Records": f"{r['param_total_records']:,}",
                    "Processes": r["param_num_processes"],
                    "Duplication Rate": r["param_duplication_rate"],
                    "Deduplication Window": r["param_deduplication_window"],
                    "Max Batch Size": r["param_max_batch_size"],
                    "Max Delay Time": r["param_max_delay_time"],
                },
                "Results": {
                    "Success": str(r["result_success"]),
                    "Published": f"{r['result_num_records']:,}",
                    "Uniques": f"{r['result_total_generated']:,}",
                    "Duplicates": f"{r['result_total_duplicates']:,}",
                    "Source RPS in Kafka": f"{r['result_kafka_ingestion_rps']:,} records/s",
                    "End-to-end RPS": f"{r['result_glassflow_rps']:,} records/s",
                    "Average Latency": f"{r['result_avg_latency_ms']:.4f} ms",
                    "Lag": _fmt_ms(r["result_lag_ms"]),
                    "Wall": f"{r['duration_sec']}s",
                },
            },
            indent=2,
        )
        ok = bool(r["result_success"])
        panel(
            body,
            title=f"Test Results for {r['variant_id']} - {'Success' if ok else 'Failed'}",
            border_color="blue" if ok else "red",
        )
        print()
    if rows:
        ok_n = sum(1 for r in rows if r["result_success"])
        best = max(rows, key=lambda r: r["result_glassflow_rps"])
        log(
            f"{ok_n}/{len(rows)} variants succeeded; best e2e "
            f"{best['result_glassflow_rps']:,} rps ({best['variant_id']})",
            status="Success" if ok_n == len(rows) else f"{len(rows) - ok_n} failed",
            is_success=ok_n == len(rows),
            is_failure=ok_n < len(rows),
            component="Results",
        )


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
