"""Crash-recovery proof for the streaming dedup pipeline (W7, SURVEY.md §7.5).

The replay test in tests/test_streaming.py proves the SINK is idempotent
(batch_id-keyed overwrite); this module proves the whole ENGINE recovers: a
child process running the reference dedup pipeline is SIGKILLed — process
group and JVM included — between two RocksDB state-store commits, then a
fresh process resumes from the changelog checkpoint and must converge to the
exact unique count with zero duplicates and zero losses.

Why a subprocess: an in-process ``query.stop()`` is a cooperative interrupt
that lets Spark unwind cleanly; a real crash leaves half-written changelog
files, an uncommitted offsets entry, and partial sink output. SIGKILL of the
whole process group (Python driver + JVM) is the honest simulation of an
executor/driver loss at 100 TB.

Parity note: the reference has no recovery story to port — its dedup engine
is a closed Docker service (/root/reference/docker-compose-glassflow.yaml) and
its harness just re-runs the whole load test. Recovery semantics here come
from Structured Streaming's contract: offsets+commits WAL, versioned state
store with changelog checkpointing, at-least-once foreachBatch made
exactly-once by the batch_id-keyed sink (streaming/sink.py).

Run the child directly:
    python -m clickhouse_etl_loadtest_spark.streaming.recovery \
        --work /tmp/wave --records 240000 --staging-files 12
Run the full kill/resume harness from code: :func:`crash_recovery_wave`.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

PIPELINE_ID = "user-events-dedup"  # config/reference_pipeline.py
DUPLICATION_RATE = 0.1


def _commits_dir(work: str) -> str:
    return f"{work}/ckpt/{PIPELINE_ID}/commits"


def _count_commits(work: str) -> int:
    """Committed micro-batches = digit-named files in the checkpoint's
    commits WAL (temp files are dot-prefixed and excluded)."""
    try:
        return sum(1 for n in os.listdir(_commits_dir(work)) if n.isdigit())
    except FileNotFoundError:
        return 0


def _child_cmd(
    work: str, records: int, staging_files: int, files_per_trigger: int, operator: str
) -> list[str]:
    return [
        sys.executable,
        "-m",
        "clickhouse_etl_loadtest_spark.streaming.recovery",
        "--work",
        work,
        "--records",
        str(records),
        "--staging-files",
        str(staging_files),
        "--files-per-trigger",
        str(files_per_trigger),
        "--operator",
        operator,
    ]


def crash_recovery_wave(
    work: str,
    total_records: int,
    staging_files: int = 12,
    files_per_trigger: int = 1,
    kill_after_commits: int = 2,
    timeout_s: float = 1800.0,
    operator: str = "builtin",
) -> dict:
    """Kill the streaming dedup mid-flight and prove the resumed query
    converges to the exact answer.

    1. Launch the child pipeline in its own process group.
    2. Poll the checkpoint commits WAL; once ``kill_after_commits`` batches
       have committed (with more staged batches still pending), SIGKILL the
       whole group — Python driver and JVM die uncleanly.
    3. Launch a fresh child on the same work dir: it resumes from the
       checkpoint (dedup state from the RocksDB changelog, source position
       from the offsets WAL) and drains the remaining input.
    4. Validate the sink exactly: rows == distinct keys == the generator's
       closed-form unique count.

    ``operator`` picks the recovery surface under test:
    - ``"builtin"`` — the reference pipeline's ``dropDuplicatesWithinWatermark``
      path (built-in state).
    - ``"counts"`` — the CUSTOM ``applyInPandasWithState`` operator
      (``stateful.py::dedup_with_counts``): update-mode cumulative rows, so
      validation takes each key's row from the LAST batch that touched it
      and asserts sum(is_first_emit) == uniques AND the summed latest
      duplicate counts == total - uniques — exact accounting survives the
      kill, proving custom Python-managed state recovers from the changelog
      the same as built-in state.

    Returns the evidence dict recorded in BENCH_PROFILE / SCALING.md.
    """
    import duckdb

    repo_root = str(Path(__file__).resolve().parents[2])
    cmd = _child_cmd(work, total_records, staging_files, files_per_trigger, operator)
    os.makedirs(work, exist_ok=True)

    # --- run 1: start, then kill between commits -------------------------
    t0 = time.perf_counter()
    with open(f"{work}/child_run1.log", "wb") as log1:
        proc = subprocess.Popen(
            cmd, cwd=repo_root, stdout=log1, stderr=subprocess.STDOUT, start_new_session=True
        )
        deadline = time.monotonic() + timeout_s
        while True:
            commits = _count_commits(work)
            if commits >= kill_after_commits:
                break
            if proc.poll() is not None:
                raise RuntimeError(
                    f"child exited (rc={proc.returncode}) before reaching "
                    f"{kill_after_commits} commits — see {work}/child_run1.log"
                )
            if time.monotonic() > deadline:
                os.killpg(proc.pid, signal.SIGKILL)
                raise TimeoutError(f"no {kill_after_commits} commits within {timeout_s}s")
            time.sleep(0.05)
        commits_at_kill = commits
        os.killpg(proc.pid, signal.SIGKILL)  # start_new_session=True => pgid == pid
        proc.wait(timeout=60)
    wall_run1 = time.perf_counter() - t0
    if proc.returncode == 0 or os.path.exists(f"{work}/done.json"):
        raise RuntimeError(
            "child finished before the kill landed — the wave is too small to "
            "be mid-flight at the kill point; raise total_records/staging_files"
        )

    # --- run 2: resume from the checkpoint --------------------------------
    t1 = time.perf_counter()
    with open(f"{work}/child_run2.log", "wb") as log2:
        rc = subprocess.run(
            cmd, cwd=repo_root, stdout=log2, stderr=subprocess.STDOUT, timeout=timeout_s
        ).returncode
    wall_run2 = time.perf_counter() - t1
    if rc != 0:
        raise RuntimeError(f"resumed child failed (rc={rc}) — see {work}/child_run2.log")
    with open(f"{work}/done.json") as f:
        done = json.load(f)

    # --- exact validation --------------------------------------------------
    from ..sources.generator import unique_count

    expected = unique_count(total_records, DUPLICATION_RATE)
    if operator == "counts":
        # update-mode sink: per key, the row from the LAST batch carries the
        # cumulative suppressed count; first-emit rows appear exactly once
        distinct, firsts, dups = duckdb.sql(
            f"""
            WITH t AS (
                SELECT * FROM read_parquet('{work}/sink/batch=*/*.parquet', hive_partitioning=1)
            ),
            latest AS (
                -- batch is a hive partition column; cast so 'latest' is
                -- numeric order (lexicographic VARCHAR picks '9' over '12')
                SELECT key, max_by(n_duplicates, CAST(batch AS BIGINT)) AS n_dups
                FROM t GROUP BY key
            )
            SELECT (SELECT count(*) FROM latest),
                   (SELECT sum(is_first_emit) FROM t),
                   (SELECT sum(n_dups) FROM latest)
            """
        ).fetchone()
        rows = distinct
        expected_dups = total_records - expected
        ok = (
            int(distinct) == expected
            and int(firsts) == expected
            and int(dups) == expected_dups
        )
    else:
        rows, distinct = duckdb.sql(
            f"SELECT count(*), count(DISTINCT event_id) FROM read_parquet('{work}/sink/batch=*/*.parquet')"
        ).fetchone()
        ok = int(rows) == expected and int(distinct) == expected
    commits_total = _count_commits(work)
    out = {
        "operator": operator,
        "total_records": total_records,
        "expected_unique": expected,
        "sink_rows": int(rows),
        "sink_distinct_keys": int(distinct),
        "commits_at_kill": commits_at_kill,
        "commits_total": commits_total,
        "recovered_batches": commits_total - commits_at_kill,
        "killed_returncode": proc.returncode,  # -9 == SIGKILL
        "wall_run1_to_kill_sec": round(wall_run1, 2),
        "wall_run2_sec": round(wall_run2, 2),
        "run2_stream_sec": done.get("stream_sec"),
        "success": ok,
    }
    if operator == "counts":
        out["sum_first_emits"] = int(firsts)
        out["sum_latest_duplicate_counts"] = int(dups)
        out["expected_duplicates"] = total_records - expected
    return out


# --------------------------------------------------------------------------
# child entrypoint: one AvailableNow wave of the reference dedup pipeline
# --------------------------------------------------------------------------


def _child_main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work", required=True)
    ap.add_argument("--records", type=int, required=True)
    ap.add_argument("--staging-files", type=int, default=12)
    ap.add_argument("--files-per-trigger", type=int, default=1)
    ap.add_argument("--operator", choices=("builtin", "counts"), default="builtin")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ..config.reference_pipeline import reference_pipeline
    from ..session import get_spark
    from ..sources.generator import generate_user_events
    from .query import run_streaming_pipeline, stop_pipeline

    # same RocksDB surface as bench.py's 20M wave (blind puts, changelog
    # checkpointing via get_spark(streaming=True)) so the recovered wall is
    # comparable to the uninterrupted one
    spark = get_spark(
        app_name="crash-recovery-wave",
        streaming=True,
        extra_conf={
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "false",
            "spark.sql.streaming.stateStore.rocksdb.compression": "no_compression",
        },
    )
    work = args.work
    staging = f"{work}/staging"
    if not os.path.exists(f"{staging}/_SUCCESS"):
        # deterministic generator: a re-run would produce identical bytes, but
        # skip anyway — the FileStreamSource tracks these exact file paths
        ev = generate_user_events(spark, args.records, DUPLICATION_RATE, num_partitions=args.staging_files)
        ev.withColumn("timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(staging)

    p = reference_pipeline()
    topic = p.source.topics[0].name
    stream = (
        spark.readStream.schema(spark.read.parquet(staging).schema)
        # several micro-batches per wave => commits to kill between
        .option("maxFilesPerTrigger", str(args.files_per_trigger))
        .parquet(staging)
    )
    t0 = time.perf_counter()
    if args.operator == "counts":
        # the custom applyInPandasWithState operator under the same kill:
        # Python-managed (first_us, dups) state in RocksDB, update mode,
        # same batch_id-keyed idempotent sink; checkpoint path shared with
        # the builtin branch so the harness's commit polling works unchanged
        from .sink import chunked_foreach_batch_writer, idempotent_parquet_chunk_writer
        from .stateful import dedup_with_counts

        out = dedup_with_counts(stream, key="event_id", time_window="8h", ts_col="timestamp")
        writer = chunked_foreach_batch_writer(
            idempotent_parquet_chunk_writer(f"{work}/sink"), p.sink.max_batch_size
        )
        query = (
            out.writeStream.outputMode("update")
            .foreachBatch(writer)
            .queryName(PIPELINE_ID)
            .option("checkpointLocation", f"{work}/ckpt/{PIPELINE_ID}")
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not query.awaitTermination(1800):
                raise TimeoutError("wave did not drain in 1800s")
        finally:
            query.stop()
    else:
        query = run_streaming_pipeline(
            spark,
            p,
            f"{work}/sink",
            f"{work}/ckpt",
            sources={topic: stream},
            trigger="available_now",
            await_ready=False,
        )
        try:
            if not query.awaitTermination(1800):
                raise TimeoutError("wave did not drain in 1800s")
        finally:
            stop_pipeline(p.pipeline_id)
    with open(f"{work}/done.json", "w") as f:
        json.dump({"stream_sec": round(time.perf_counter() - t0, 2)}, f)


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess
    _child_main()
