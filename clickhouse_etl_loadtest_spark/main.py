"""CLI entry point — the reference's ``main.py`` surface (C1, SURVEY.md §2.10)
on Spark: grid benchmark, single-variant run, resume, plus a ``serve`` mode
that runs the pipeline control-plane the reference assumes as an external
docker service.

Usage:
    python main.py --test-id T --config load_test_params.json \
        --pipeline-config pipeline.json [--results-dir results] [--no-resume] \
        [--master local[32]] [--work-dir /tmp/etl-work]
    python main.py --test-id T --single-config '{"total_records": 100000}' ...
    python main.py serve [--host 127.0.0.1] [--port 8080] \
        [--work-dir /tmp/etl-service] [--files-path DIR] [--master local[32]]
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark ETL load-test harness")
    p.add_argument("--test-id", required=True)
    p.add_argument("--config", help="grid parameter JSON file")
    p.add_argument("--single-config", help="inline JSON for one variant")
    p.add_argument("--pipeline-config", required=True, help="pipeline spec JSON")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--work-dir", default="/tmp/etl-work")
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--no-resume", action="store_true")
    return p.parse_args(argv)


def serve(argv: list[str], block: bool = True):
    """Run the pipeline control-plane service (service/server.py): the HTTP
    surface the reference drives remotely, here served by the engine itself.
    ``block=False`` returns (service, url) for in-process callers/tests."""
    p = argparse.ArgumentParser(prog="main.py serve")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--work-dir", default="/tmp/etl-service")
    p.add_argument("--files-path", default=None, help="resolve non-Kafka topic sources to JSON file streams under this dir")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from clickhouse_etl_loadtest_spark.service import PipelineService
    from clickhouse_etl_loadtest_spark.session import get_spark

    spark = get_spark(app_name="pipeline-service", master=args.master)
    svc = PipelineService(
        spark, args.work_dir, files_path=args.files_path, host=args.host, port=args.port
    )
    url = svc.start()
    print(f"pipeline service listening on {url}", flush=True)
    if not block:
        return svc, url
    import threading

    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        pass
    finally:
        svc.stop()
        spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "serve":
        return serve(argv[1:])
    args = parse_args(argv)
    from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
    from clickhouse_etl_loadtest_spark.harness.executor import TestExecutor
    from clickhouse_etl_loadtest_spark.harness.grid import LoadTestGrid
    from clickhouse_etl_loadtest_spark.session import get_spark

    pipeline = PipelineConfig.from_json_file(args.pipeline_config)
    if args.single_config:
        combinations = [json.loads(args.single_config)]
    elif args.config:
        with open(args.config) as fh:
            grid = LoadTestGrid.model_validate(json.load(fh))
        combinations = grid.generate_combinations()
    else:
        print("one of --config/--single-config is required", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"loadtest-{args.test_id}", master=args.master)
    executor = TestExecutor(
        spark,
        test_id=args.test_id,
        pipeline_template=pipeline,
        work_dir=args.work_dir,
        results_file=f"{args.results_dir}/{args.test_id}_results.csv",
    )
    results = executor.run_tests(combinations, resume=not args.no_resume)
    for r in results:
        print(
            f"{r.variant_id}: success={r.result_success} records={r.result_num_records} "
            f"ingest_rps={r.result_kafka_ingestion_rps:.0f} etl_rps={r.result_glassflow_rps:.0f} "
            f"wall={r.duration_sec}s"
        )
    print(f"{len(results)} variants run; results -> {executor.results.results_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
