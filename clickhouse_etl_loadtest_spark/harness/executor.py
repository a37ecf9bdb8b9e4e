"""Variant executor: the reference's run loop re-expressed on Spark
(C2-C6 in SURVEY.md §2.10; lifecycle §3.1).

Per variant: cleanup -> publish (generate events with duplicates; the
multiprocessing publisher pool becomes ONE Spark batch job repartitioned to
``num_processes`` tasks — executors are the process pool) -> ETL (the dedup
pipeline; batch ``compile_batch`` or a streaming AvailableNow wave) -> verify
(sink count == unique count, the reference's invariant,
/root/reference/src/pipeline_test.py:13-45) -> metrics row appended to the
results CSV, with resume skipping already-completed variant ids.
"""

from __future__ import annotations

import shutil
import time
from typing import Any

from pyspark.sql import SparkSession

from ..config.schemas import PipelineConfig
from ..plans.compiler import compile_batch, write_sink_batch
from ..sources.generator import generate_user_events, unique_count
from .metrics import TestResult, TestResultsHandler
from .variants import variant_id

DEFAULTS = {
    "num_processes": 1,
    "total_records": 10_000,
    "duplication_rate": 0.1,
    "deduplication_window": "8h",
    "max_batch_size": 5000,
    "max_delay_time": "10s",
}


def _apply_variant(pipeline: PipelineConfig, params: dict[str, Any], vid: str) -> PipelineConfig:
    """Re-point the pipeline template at this variant (P2/C5 parity:
    /root/reference/src/pre_process.py:17-35): sink table, dedup window,
    batch size/delay take the variant's values."""
    p = pipeline.model_copy(deep=True)
    p.pipeline_id = vid
    p.sink.table = vid
    p.sink.max_batch_size = int(params["max_batch_size"])
    p.sink.max_delay_time = str(params["max_delay_time"])
    for topic in p.source.topics:
        if topic.deduplication.enabled:
            topic.deduplication.time_window = str(params["deduplication_window"])
    return p


class TestExecutor:
    def __init__(
        self,
        spark: SparkSession,
        test_id: str,
        pipeline_template: PipelineConfig,
        work_dir: str,
        results_file: str,
    ):
        self.spark = spark
        self.test_id = test_id
        self.template = pipeline_template
        self.work_dir = work_dir
        self.results = TestResultsHandler(results_file)

    def run_tests(self, combinations: list[dict[str, Any]], resume: bool = True) -> list[TestResult]:
        """One failing variant does not abort the grid (C3 parity: the
        reference records the error and continues,
        /root/reference/src/test_executor.py:35-67)."""
        completed = self.results.completed_variant_ids() if resume else set()
        out = []
        for combo in combinations:
            params = {**DEFAULTS, **combo}
            vid = variant_id(params)
            if vid in completed:
                continue
            try:
                out.append(self.run_variant_test(vid, params))
            except Exception as exc:  # recorded by run_variant_test; keep going
                print(f"variant {vid} failed: {exc}")
        return out

    def run_variant_test(self, vid: str, params: dict[str, Any]) -> TestResult:
        result = TestResult(
            test_id=self.test_id,
            variant_id=vid,
            param_num_processes=int(params["num_processes"]),
            param_total_records=int(params["total_records"]),
            param_duplication_rate=float(params["duplication_rate"]),
            param_deduplication_window=str(params["deduplication_window"]),
            param_max_batch_size=int(params["max_batch_size"]),
            param_max_delay_time=str(params["max_delay_time"]),
        )
        t_variant = time.perf_counter()
        try:
            result = self._run_variant(vid, params, result)
        except Exception:
            result.result_success = False
            result.duration_sec = round(time.perf_counter() - t_variant, 2)
            self.results.write_result(result.with_derived_rates())
            raise
        result.duration_sec = round(time.perf_counter() - t_variant, 2)
        result = result.with_derived_rates()
        self.results.write_result(result)
        return result

    def _run_variant(self, vid: str, params: dict[str, Any], result: TestResult) -> TestResult:
        total = int(params["total_records"])
        rate = float(params["duplication_rate"])
        n_proc = int(params["num_processes"])
        n_unique = unique_count(total, rate)
        pipeline = _apply_variant(self.template, params, vid)
        topic = pipeline.source.topics[0].name

        staging = f"{self.work_dir}/{vid}/topic"
        sink = f"{self.work_dir}/{vid}/sink"
        shutil.rmtree(f"{self.work_dir}/{vid}", ignore_errors=True)  # S2/S12 cleanup analogue

        # publish phase: generation parallelism = partitions (C6)
        t0 = time.perf_counter()
        # generator already emits exactly n_proc partitions (spark.range slices)
        # — writing directly avoids a full round-robin shuffle of the payload.
        events = generate_user_events(self.spark, total, rate, num_partitions=n_proc)
        events.write.mode("overwrite").parquet(staging)
        publish_ms = (time.perf_counter() - t0) * 1000
        result.result_num_records = total
        result.result_total_generated = n_unique
        result.result_total_duplicates = total - n_unique
        result.result_num_processes = n_proc
        result.result_time_taken_publish_ms = round(publish_ms, 1)

        # ETL phase: dedup + mapping -> sink
        t1 = time.perf_counter()
        published = self.spark.read.parquet(staging)
        out = compile_batch(pipeline, {topic: published})
        write_sink_batch(out, pipeline, sink)  # clustered by the ORDER BY key (S8 rule)
        etl_ms = (time.perf_counter() - t1) * 1000
        result.result_time_taken_ms = round(publish_ms + etl_ms, 1)

        # verify phase (D3): sink count == unique count
        t2 = time.perf_counter()
        got = self.spark.read.parquet(sink).count()
        result.result_lag_ms = round((time.perf_counter() - t2) * 1000, 1)
        result.result_success = got == n_unique
        if not result.result_success:
            raise AssertionError(f"{vid}: sink count {got} != expected uniques {n_unique}")
        return result
