"""Crash-mid-flight recovery of the streaming dedup (W7, SURVEY.md §7.5).

The harness SIGKILLs the whole child process group (Python driver + JVM)
between two RocksDB state-store commits, then resumes from the changelog
checkpoint in a fresh process. The resumed query must converge to the exact
unique count — zero duplicates, zero losses — which exercises all three
recovery layers at once: the offsets/commits WAL (source position), the
RocksDB changelog (dedup state), and the batch_id-keyed idempotent sink
(the replayed uncommitted batch overwrites its own partial output).
"""

import shutil
import tempfile

import pytest

from clickhouse_etl_loadtest_spark.streaming.recovery import crash_recovery_wave


@pytest.fixture
def work_dir():
    d = tempfile.mkdtemp(prefix="crash-recovery-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sigkill_mid_stream_resumes_to_exact_count(work_dir):
    r = crash_recovery_wave(
        work_dir,
        total_records=240_000,
        staging_files=12,
        files_per_trigger=1,
        kill_after_commits=2,
        timeout_s=600,
    )
    # the kill was a real SIGKILL, landed mid-flight (batches still pending)
    assert r["killed_returncode"] == -9
    assert r["commits_at_kill"] < r["commits_total"]
    assert r["recovered_batches"] >= 1
    # exact convergence: every unique exactly once
    assert r["sink_rows"] == r["expected_unique"]
    assert r["sink_distinct_keys"] == r["expected_unique"]
    assert r["success"]


def test_sigkill_mid_stream_custom_stateful_operator(work_dir):
    """The same SIGKILL/resume cycle over the CUSTOM applyInPandasWithState
    operator (dedup_with_counts): Python-managed per-key state must rebuild
    from the changelog so the cumulative duplicate accounting stays exact —
    sum of first-emits == uniques, summed latest counts == total dups."""
    # smaller than the builtin test: the Python-state path pays one Arrow
    # round-trip per key-group, so batches are slower (which also makes the
    # mid-flight kill window wider)
    r = crash_recovery_wave(
        work_dir,
        total_records=100_000,
        staging_files=10,
        files_per_trigger=1,
        kill_after_commits=2,
        timeout_s=600,
        operator="counts",
    )
    assert r["killed_returncode"] == -9
    assert r["commits_at_kill"] < r["commits_total"]
    assert r["sink_distinct_keys"] == r["expected_unique"]
    assert r["sum_first_emits"] == r["expected_unique"]
    assert r["sum_latest_duplicate_counts"] == r["expected_duplicates"]
    assert r["success"]
