"""Harness tests (SURVEY.md §5 item 4): grid expansion against hand-counted
combinations, variant-id determinism, CSV round-trip, resume-skip, and a full
small variant run through the executor."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.harness.executor import TestExecutor
from clickhouse_etl_loadtest_spark.harness.grid import LoadTestGrid, ParameterRange, expand_range
from clickhouse_etl_loadtest_spark.harness.metrics import TestResult, TestResultsHandler
from clickhouse_etl_loadtest_spark.harness.variants import variant_id

from .test_pipeline_slice import PIPELINE_SPEC


def test_expand_range_inclusive_int():
    assert expand_range(ParameterRange(min=2, max=12, step=2)) == [2, 4, 6, 8, 10, 12]


def test_expand_range_float_rounding():
    got = expand_range(ParameterRange(min=0.1, max=0.5, step=0.1))
    assert got == [0.1, 0.2, 0.3, 0.4, 0.5]  # no 0.30000000000000004


def test_grid_cartesian_and_sampling():
    grid = LoadTestGrid(
        parameters={
            "total_records": {"values": [1000, 2000, 3000, 4000]},
            "num_processes": {"min": 1, "max": 3, "step": 1},
        }
    )
    combos = grid.generate_combinations()
    assert len(combos) == 12
    grid2 = grid.model_copy(update={"max_combinations": 5})
    sampled = grid2.generate_combinations()
    assert len(sampled) == 5
    assert sampled[0] == combos[0]  # even sampling keeps the first combo


def test_variant_id_determinism_and_shape():
    cfg = {"total_records": 5000, "duplication_rate": 0.1}
    a = variant_id(cfg)
    b = variant_id({"duplication_rate": 0.1, "total_records": 5000})  # key order irrelevant
    assert a == b
    assert a.startswith("load_") and len(a) == 13
    assert variant_id({**cfg, "total_records": 5001}) != a


def test_results_csv_round_trip(tmp_path):
    f = str(tmp_path / "r.csv")
    h = TestResultsHandler(f)
    r = TestResult(
        test_id="t", variant_id="load_1", result_num_records=1000,
        result_time_taken_publish_ms=100.0, result_time_taken_ms=500.0,
        result_success=True,
    ).with_derived_rates()
    h.write_result(r)
    h.write_result(r.model_copy(update={"variant_id": "load_2", "result_success": False}))
    back = h.read_validated_results()
    assert len(back) == 2
    assert back[0].result_kafka_ingestion_rps == 10000  # 1000*1000/100
    assert back[0].result_glassflow_rps == 2000  # round(1000/500*1000)
    assert back[0].result_avg_latency_ms == 0.5
    assert h.completed_variant_ids() == {"load_1"}  # only successes resume-skip


def test_results_csv_rejects_schema_drift(tmp_path):
    f = tmp_path / "bad.csv"
    f.write_text("foo,bar\n1,2\n")
    with pytest.raises(ValueError, match="fields"):
        TestResultsHandler(str(f)).read_validated_results()


@settings(max_examples=20, deadline=None)
@given(
    total=st.integers(min_value=100, max_value=50_000),
    rate=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_unique_count_invariants(total, rate):
    from clickhouse_etl_loadtest_spark.sources.generator import unique_count

    n = unique_count(total, rate)
    assert 0 < n <= total
    # definitional property of n = floor(total / (1 + rate)):
    assert n * (1 + rate) <= total + 1e-9
    assert (n + 1) * (1 + rate) > total - 1e-9


def test_executor_end_to_end_with_resume(spark, tmp_path):
    pipeline = PipelineConfig.model_validate(PIPELINE_SPEC)
    results_file = str(tmp_path / "results.csv")
    ex = TestExecutor(spark, "t1", pipeline, str(tmp_path / "work"), results_file)
    combos = [{"total_records": 1100, "num_processes": 2}]

    first = ex.run_tests(combos, resume=True)
    assert len(first) == 1
    r = first[0]
    assert r.result_success
    assert r.result_total_generated == 1000
    assert r.result_total_duplicates == 100
    assert r.result_kafka_ingestion_rps > 0 and r.result_glassflow_rps > 0

    # resume: same combo skipped
    second = ex.run_tests(combos, resume=True)
    assert second == []
    # no-resume: runs again
    third = ex.run_tests(combos, resume=False)
    assert len(third) == 1


def test_cli_single_config(tmp_path, spark):
    import clickhouse_etl_loadtest_spark.main as cli

    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(PIPELINE_SPEC))
    rc = cli.main([
        "--test-id", "cli1",
        "--pipeline-config", str(p),
        "--single-config", json.dumps({"total_records": 550}),
        "--results-dir", str(tmp_path / "results"),
        "--work-dir", str(tmp_path / "work"),
    ])
    assert rc == 0
    rows = TestResultsHandler(str(tmp_path / "results" / "cli1_results.csv")).read_validated_results()
    assert len(rows) == 1 and rows[0].result_success


def test_results_analyzer_cli(tmp_path, capsys):
    """results.py parity (C8/§3.3): validated read + per-variant display."""
    import clickhouse_etl_loadtest_spark.results as results_cli
    from clickhouse_etl_loadtest_spark.harness.metrics import TestResult, TestResultsHandler

    f = str(tmp_path / "r.csv")
    h = TestResultsHandler(f)
    h.write_result(
        TestResult(
            test_id="t",
            variant_id="load_abc12345",
            param_num_processes=2,
            param_total_records=1000,
            param_duplication_rate=0.1,
            param_deduplication_window="1h",
            param_max_batch_size=100,
            param_max_delay_time="1s",
            result_num_records=1000,
            result_total_generated=909,
            result_total_duplicates=91,
            result_num_processes=2,
            result_time_taken_publish_ms=100.0,
            result_time_taken_ms=200.0,
            result_lag_ms=5.0,
            result_success=True,
            duration_sec=1.0,
        ).with_derived_rates()
    )
    assert results_cli.main(["--results-file", f]) == 0
    out = capsys.readouterr().out
    assert "load_abc12345" in out and "1/1 variants succeeded" in out


def test_executor_failure_path_records_result(spark, tmp_path):
    """A failing variant writes its CSV row with result_success=False and a
    real duration, and the grid CONTINUES past it (C3 parity: the reference
    records the error panel and moves on,
    /root/reference/src/test_executor.py:35-67)."""
    from clickhouse_etl_loadtest_spark.config.reference_pipeline import reference_pipeline
    from clickhouse_etl_loadtest_spark.harness.executor import TestExecutor

    broken = reference_pipeline()
    # dedup key that does not exist in the generated schema -> analysis error
    broken.source.topics[0].deduplication.id_field = "no_such_column"
    f = str(tmp_path / "r.csv")
    ex = TestExecutor(spark, "t", broken, str(tmp_path / "work"), f)
    ok_results = ex.run_tests(
        [{"total_records": 100}, {"total_records": 200}], resume=False
    )
    assert ok_results == []  # both variants failed, none aborted the loop
    rows = ex.results.read_validated_results()
    assert len(rows) == 2  # every failure recorded
    assert all(r.result_success is False for r in rows)
    assert all(r.duration_sec > 0 for r in rows)
