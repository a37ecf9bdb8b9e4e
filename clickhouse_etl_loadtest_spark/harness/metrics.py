"""Result model + CSV persistence + resume (S15/S16/A3/A4, SURVEY.md §2).

Schema parity: the 21 fields of the reference's TestResultModel
(/root/reference/src/utils/metrics.py:13-42; field list frozen in
FIXTURES.md A4). Derived-rate formulas are kept identical for BENCH
comparability (/root/reference/src/pipeline_test.py:104-111,
/root/reference/src/utils/publish.py:61-65):

    kafka_ingestion_rps = num_records * 1000 / time_taken_publish_ms
    glassflow_rps       = round(num_records / time_taken_ms * 1000)
    avg_latency_ms      = time_taken_ms / num_records
    lag_ms              = drain-poll duration after publish completes
"""

from __future__ import annotations

import csv
import os
from datetime import datetime

from pydantic import BaseModel


class TestResult(BaseModel):
    test_id: str
    variant_id: str
    timestamp: str = ""
    duration_sec: float = 0.0
    param_num_processes: int = 1
    param_total_records: int = 0
    param_duplication_rate: float = 0.1
    param_deduplication_window: str = "8h"
    param_max_batch_size: int = 5000
    param_max_delay_time: str = "10s"
    result_total_generated: int = 0
    result_total_duplicates: int = 0
    result_num_records: int = 0
    result_num_processes: int = 1
    result_time_taken_publish_ms: float = 0.0
    result_kafka_ingestion_rps: float = 0.0
    result_success: bool = False
    result_time_taken_ms: float = 0.0
    result_avg_latency_ms: float = 0.0
    result_lag_ms: float = 0.0
    result_glassflow_rps: float = 0.0

    def with_derived_rates(self) -> "TestResult":
        """Apply the reference's exact formulas (see module docstring)."""
        upd = self.model_copy()
        if upd.result_time_taken_publish_ms > 0:
            upd.result_kafka_ingestion_rps = round(
                upd.result_num_records * 1000 / upd.result_time_taken_publish_ms
            )
        if upd.result_time_taken_ms > 0 and upd.result_num_records > 0:
            upd.result_glassflow_rps = round(upd.result_num_records / upd.result_time_taken_ms * 1000)
            upd.result_avg_latency_ms = upd.result_time_taken_ms / upd.result_num_records
        if not upd.timestamp:
            upd.timestamp = datetime.now().isoformat()
        return upd


FIELDS = list(TestResult.model_fields)


class TestResultsHandler:
    """Append-only CSV sink + strict validated reader
    (/root/reference/src/utils/metrics.py:98-150 behavior)."""

    def __init__(self, results_file: str):
        self.results_file = results_file

    def write_result(self, result: TestResult) -> None:
        new_file = not os.path.exists(self.results_file)
        os.makedirs(os.path.dirname(self.results_file) or ".", exist_ok=True)
        with open(self.results_file, "a", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=FIELDS)
            if new_file:
                writer.writeheader()
            writer.writerow(result.model_dump())

    def read_validated_results(self) -> list[TestResult]:
        """Strict field-set equality then per-row pydantic coercion — a header
        drift means the file belongs to another schema version and resume
        must not trust it."""
        if not os.path.exists(self.results_file):
            return []
        with open(self.results_file, newline="") as fh:
            reader = csv.DictReader(fh)
            if set(reader.fieldnames or []) != set(FIELDS):
                raise ValueError(
                    f"results file {self.results_file} fields {reader.fieldnames} != expected {FIELDS}"
                )
            return [TestResult.model_validate(row) for row in reader]

    def completed_variant_ids(self) -> set[str]:
        """Resume set (A4; /root/reference/src/test_executor.py:73-74).

        Header drift propagates as ValueError: swallowing it would re-run
        everything AND then append rows misaligned with the old header,
        corrupting both schemas' data. Fail fast; the operator moves or
        deletes the stale file."""
        return {r.variant_id for r in self.read_validated_results() if r.result_success}
