"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver
(BENCH_r{N}.json).

Metric formulas follow the reference for comparability (BASELINE.md):
``rps = n_rows_processed / elapsed`` per query, plus total wall time.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

PROFILE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_PROFILE.json")
WARM_RUNS = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "5"))

# Median calibration() seconds on this box in a measured-quiet state
# (local[32], load < 1, measured 2026-08-14: 12 consecutive runs settled at
# 1.13-1.33 s after one codegen-warm run). Committed as a constant so every
# run — builder's or driver's — normalizes against the SAME yardstick; a run
# whose own calibration comes in at 2x this is a run on a 2x-contended host,
# and its normalized walls say what the plan would have cost on the quiet box.
CALIB_REF_SEC = 1.15


def calibration(spark, n_runs: int = 5, runs_out: list | None = None) -> float:
    """Fixed CPU-bound yardstick: generated data, pure codegen + one 1M-key
    shuffle, zero disk I/O, deterministic. Host slowdowns (co-tenant CPU,
    thermal, scheduler pressure) move this number in proportion to how they
    move every other wall number in the bench; dividing raw walls by
    (calib / CALIB_REF_SEC) separates "the plan regressed" from "the box was
    busy" — the round-4 open question that raw walls could not answer.
    Median of ``n_runs`` (swallows one unlucky scheduling quantum); pass
    ``runs_out`` to capture the individual runs — the profile records them
    per wave so a skewed calibration (one slow run dragging the median) is
    visible in the data instead of silently scaling the whole wave
    (round-9 lesson: the r8→r9 normalized headline moved 13% on calibration
    jitter alone while per-query CPU fell)."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        (
            spark.range(0, 40_000_000, 1, 32)
            .selectExpr("(id * 2654435761) % 1048576 AS k", "id % 997 AS v")
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
            .selectExpr("sum(s * c) AS chk")
            .collect()
        )
        runs.append(time.perf_counter() - t0)
    if runs_out is not None:
        runs_out.extend(round(r, 3) for r in runs)
    return round(statistics.median(runs), 3)


def _completed_stage_metrics(spark) -> dict[int, int]:
    """Map completed stageId -> executorRunTime ms via the UI REST API.

    Executor run time is CPU-side work summed over tasks — far less sensitive
    to host I/O scheduling noise than wall clock, so round-over-round deltas
    of this number distinguish a real plan regression from a noisy box."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=5) as r:
            stages = json.load(r)
        return {s["stageId"]: s.get("executorRunTime", 0) for s in stages}
    except Exception:  # UI disabled or endpoint unavailable: profile degrades gracefully
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clickhouse_etl_loadtest_spark.queries import load_all
    from clickhouse_etl_loadtest_spark.session import get_spark

    from pyspark.sql import functions as F

    registry = load_all()
    headline = {name: q for name, q in sorted(registry.items()) if q.headline}

    # UI on for bench only: the stage-time profile reads the REST status API
    # (sessions elsewhere keep it off; a benchmark's listener-bus overhead is
    # noise-level next to the queries it times)
    spark = get_spark(app_name="bench", extra_conf={"spark.ui.enabled": "true"})
    # JVM + codegen + shuffle + parquet-reader + higher-order-function warmup
    # so per-query timings measure the plan, not class loading. Touches a
    # non-fixture path and generated data only — no headline query pre-runs.
    spark.range(10_000).selectExpr("sum(id)").collect()
    warm = spark.range(1_000).selectExpr(
        "id % 7 AS k",
        "array_repeat(cast(id as double), 8) AS arr",
        "repeat(concat('w', cast(id as string), ' '), 5) AS txt",
    )
    warm.groupBy("k").agg(
        F.sum(F.aggregate("arr", F.lit(0.0), lambda a, x: a + x))
    ).collect()
    warm.select(F.explode(F.regexp_extract_all("txt", F.lit("[a-z0-9]+"), 0))).count()
    # md5/conv hashing, zip_with shingling, stack + collect_set: the expression
    # classes the text-dedup headliners load first. (Measured: the remaining
    # first-run premium on doc_minhash_lsh_pairs is Janino compilation of that
    # query's own whole-stage-codegen units — not reachable generically, and
    # pre-running headline queries would no longer measure cold plans.)
    w2 = warm.select("k", F.regexp_extract_all("txt", F.lit("[a-z0-9]+"), 0).alias("toks"))
    n3 = F.size("toks") - 2
    shingles = F.array_distinct(
        F.zip_with(
            F.zip_with(F.slice("toks", 1, n3), F.slice(F.col("toks"), 2, n3), lambda a, b: F.concat_ws(" ", a, b)),
            F.slice(F.col("toks"), 3, n3),
            lambda ab, c: F.concat_ws(" ", ab, c),
        )
    )
    hashed = w2.select("k", F.explode(shingles).alias("s")).select(
        "k", F.conv(F.substring(F.md5(F.col("s").cast("string")), 1, 8), 16, 10).cast("long").alias("h")
    )
    # 16-buffer MIN aggregate + stack + bucket-collect + array pair expansion:
    # the signature/banding stage shapes of the minhash headliner (same
    # aggregate-buffer count and array machinery, non-fixture data). Measured
    # effect is modest (~0.3 s) — the remaining cold premium is this host's
    # JIT ramp on each query's own compiled stages, which run-to-run load
    # swings by more than the premium itself.
    sig = hashed.groupBy("k").agg(
        *[F.min((F.lit(7 + i) * F.col("h") + 3 + i) % 2147483647).alias(f"m{i}") for i in range(16)]
    )
    stack16 = ", ".join(
        f"{b}, concat_ws('_', {', '.join(f'm{b * 4 + r}' for r in range(4))})" for b in range(4)
    )
    bk = (
        sig.selectExpr("k", f"stack(4, {stack16}) as (b, s)")
        .groupBy("b", "s")
        .agg(F.sort_array(F.collect_set("k")).alias("ids"))
    )
    pair_expand = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    bk.select(F.explode(pair_expand)).select("col.*").distinct().count()
    warm.write.mode("overwrite").parquet("/tmp/bench-warmup")
    spark.read.parquet("/tmp/bench-warmup").count()

    # Calibration BEFORE the queries section: every wall number below ships
    # raw and normalized by (calib / CALIB_REF_SEC). A contended host inflates
    # calibration and the queries alike; the normalized number is the
    # apples-to-apples plan cost (round-4 lesson: official walls doubled on
    # unchanged code with no way to prove the box did it). One discarded run
    # first: the yardstick's own whole-stage codegen costs ~4 s once, and
    # CALIB_REF_SEC was measured post-warm.
    calibration(spark, n_runs=1)
    calib = {"ref_sec": CALIB_REF_SEC}
    calib_runs: dict[str, list] = {}
    calib["queries_sec"] = calibration(
        spark, runs_out=calib_runs.setdefault("queries", [])
    )
    print(f"# calibration (queries section): {calib['queries_sec']}s vs ref {CALIB_REF_SEC}s", file=sys.stderr)

    # Each query is timed 1 cold + WARM_RUNS warm times. The cold run pays
    # Janino whole-stage-codegen compilation and first-touch class loading —
    # a once-per-executor cost that amortizes to nothing at 100 TB (seconds
    # of compile vs hours of scan). The warm MEDIAN is the primary metric:
    # single warm runs on this box swing with host load (r2->r3 moved every
    # query, including trivial ones, by +8..30% — noise, not plans), so the
    # per-query spread (min/max/stdev) ships in the JSON to make that
    # distinction checkable, and the executor-run-time stage profile (CPU
    # work, immune to I/O stalls) is diffed against the committed profile of
    # the previous round (BENCH_PROFILE.json).
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, dict] = {}
    stage_cpu: dict[str, int] = {}
    for name, q in headline.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()  # forces full execution; avoids toPandas transfer cost
        cold[name] = round(time.perf_counter() - t0, 3)
        runs: list[float] = []
        cpu_runs: list[int] = []
        for _ in range(WARM_RUNS):
            before = _completed_stage_metrics(spark)
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            after = _completed_stage_metrics(spark)
            new = [ms for sid, ms in after.items() if sid not in before]
            if new:
                cpu_runs.append(sum(new))
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = {
            "runs": runs,
            "min": min(runs),
            "max": max(runs),
            "stdev": round(statistics.stdev(runs), 3) if len(runs) > 1 else 0.0,
        }
        if cpu_runs:
            stage_cpu[name] = int(statistics.median(cpu_runs))
        print(
            f"# {name}: cold {cold[name]}s warm median {timings[name]}s "
            f"(runs {runs}, stage-cpu {stage_cpu.get(name)}ms, {n} rows)",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    # host-speed factor for this section: <1 on a contended box
    q_factor = CALIB_REF_SEC / calib["queries_sec"] if calib["queries_sec"] else 1.0
    timings_norm = {n: round(t * q_factor, 3) for n, t in timings.items()}
    total_norm = round(sum(timings_norm.values()), 3)

    # Diff against the committed previous-round profile (since round 4 that
    # file is the DRIVER-environment run — the driver's round-end commit
    # includes the rewrite below — so deltas are same-environment). The noise
    # detector works on NORMALIZED walls when the previous profile carries a
    # calibration (falls back to raw for pre-calibration profiles): a raw
    # delta that disappears under normalization is the host, not the plan.
    prev_profile = None
    if os.path.exists(PROFILE_PATH):
        try:
            with open(PROFILE_PATH) as f:
                prev_profile = json.load(f)
        except (OSError, ValueError):
            prev_profile = None
    profile_delta = None
    noise_flags: list[str] = []
    if prev_profile:
        prev_calib = (prev_profile.get("calibration") or {}).get("queries_sec")
        prev_factor = CALIB_REF_SEC / prev_calib if prev_calib else None
        profile_delta = {}
        for name in timings:
            p = prev_profile.get("queries", {}).get(name)
            if not p:
                continue
            d = query_delta(
                timings[name],
                timings_norm[name],
                spread[name]["stdev"],
                q_factor,
                prev_factor,
                p,
                stage_cpu.get(name),
            )
            if not d["noise"]:
                noise_flags.append(name)
            profile_delta[name] = d

    # Reference-comparable load test: 5M records / dup 0.1 — the exact workload
    # + metric formulas of BASELINE.md row 1 (5M @ 2 procs: 8,705 kafka RPS,
    # 8,547 glassflow RPS). num_processes here = Spark partitions (C6).
    # Run twice for the same cold/steady split as the queries: single-run
    # wall on this box swings 2-3x with host I/O load (measured 13-38 s for
    # an identical plan), so the steady run is the comparable signal.
    calib["loadtest_sec"] = calibration(
        spark, runs_out=calib_runs.setdefault("loadtest", [])
    )
    loadtest = run_loadtest(spark)
    loadtest_steady = run_loadtest(spark)

    # Publisher-parallelism scaling curve, comparable to BASELINE.md's
    # num_processes sweep (reference: kafka RPS 8.7k @ 2 procs -> 49k @ 12;
    # glassflow RPS flat ~8.5k — service-bound). num_processes here = Spark
    # partitions of the generation stage (C6), so the curve shows the engine
    # scaling with parallelism instead of flat-lining on a service.
    sweep = {}
    if os.environ.get("SPARK_GRAFT_SWEEP", "1") == "1":
        default_p = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        for p in (2, 4, 8, 16, 32):
            # the default-parallelism point was already measured twice above —
            # reuse the steady run instead of a third identical 5M loadtest
            r = loadtest_steady if p == default_p else run_loadtest(spark, n_proc=p)
            sweep[str(p)] = {
                "kafka_rps": r["result_kafka_ingestion_rps"],
                "glassflow_rps": r["result_glassflow_rps"],
                "duration_sec": r["duration_sec"],
                "success": r["result_success"],
            }

    # Streaming-mode run of the same pipeline (Structured Streaming dedup via
    # dropDuplicatesWithinWatermark + chunked foreachBatch sink) — the
    # reference's actual execution model; baseline 8.0-9.4k rec/s.
    calib["stream_sec"] = calibration(
        spark, runs_out=calib_runs.setdefault("stream", [])
    )
    streaming = run_streaming_loadtest(spark)

    # Reference max-scale wave: 20M records (BASELINE.md's largest variant,
    # 2,333 s there) with RocksDB state + state-store metrics recorded.
    # Same cold/steady split as the 5M loadtest: identical-plan runs swing
    # 18-35 s standalone and up to ~57 s inside a full bench under heavy
    # host I/O (measured r4; RocksDB update time is the swing), so the
    # steady run is the comparable signal and the cold run ships alongside
    # for the spread.
    streaming_20m = None
    if os.environ.get("SPARK_GRAFT_STREAM_20M", "1") == "1":
        streaming_20m_cold = run_streaming_loadtest(
            spark, total_records=20_000_000, state_metrics=True
        )
        streaming_20m = run_streaming_loadtest(
            spark, total_records=20_000_000, state_metrics=True
        )
        streaming_20m["cold_run"] = {
            k: streaming_20m_cold[k] for k in ("duration_sec", "result_glassflow_rps")
        }

    # State-scaling wave: 100M records — 5x the reference's largest variant
    # (~90.9M dedup keys, ~9 GB of RocksDB state; fits the 128 GiB box).
    # Opt-in (SPARK_GRAFT_STREAM_100M=1): generation + the wave cost minutes,
    # past the per-round driver-bench budget, so the measured run is committed
    # in SCALING.md §"100M-record state-scaling wave" and the profile below
    # carries the most recent opt-in result forward across non-opt-in runs.
    streaming_100m = None
    if os.environ.get("SPARK_GRAFT_STREAM_100M", "0") == "1":
        streaming_100m = run_streaming_loadtest(
            spark, total_records=100_000_000, state_metrics=True
        )

    # Crash-recovery wave: SIGKILL the 20M streaming dedup mid-flight between
    # RocksDB commits, resume from the changelog checkpoint in a fresh
    # process, assert exact convergence (W7, SURVEY.md §7.5). Opt-in
    # (SPARK_GRAFT_CRASH_RECOVERY_20M=1): two subprocess Spark sessions cost
    # minutes; the measured run is committed in SCALING.md §"crash recovery"
    # and carried forward in the profile like the 100M wave.
    # sf1.0 headline wave: the same 6 headline queries at 10x the gate scale
    # (fixtures: scripts/gen_scale_tpch.py tiles the relational tables;
    # scripts/gen_scale_docs.py extends documents/embeddings). Opt-in
    # (SPARK_GRAFT_BENCH_SF1=1): fixture generation + the wave cost minutes;
    # the measured run is committed in SCALING.md and carried forward below.
    headline_sf1 = None
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "0") == "1":
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/scale/sf1.0")
        _sf1_needed = ("lineitem.parquet", "documents.parquet", "embeddings.parquet")
        _sf1_missing = [f for f in _sf1_needed if not os.path.exists(f"{sf1_dir}/{f}")]
        if _sf1_missing:
            print(
                f"# sf1.0 wave skipped: {sf1_dir} missing {_sf1_missing} — run "
                "scripts/gen_scale_tpch.py and scripts/gen_scale_docs.py first",
                file=sys.stderr,
            )
        else:
            sf1_calib = calibration(
                spark, runs_out=calib_runs.setdefault("sf1", [])
            )
            sf1_q, sf1_cold = {}, {}
            for name, q in headline.items():
                t0 = time.perf_counter()
                q.fn(spark, sf1_dir).count()
                sf1_cold[name] = round(time.perf_counter() - t0, 3)
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    q.fn(spark, sf1_dir).count()
                    runs.append(time.perf_counter() - t0)
                sf1_q[name] = round(statistics.median(runs), 3)
            headline_sf1 = {
                "fixture": sf1_dir,
                "calib_sec": sf1_calib,
                "queries": sf1_q,
                "cold_total_sec": round(sum(sf1_cold.values()), 3),
                "warm_total_sec": round(sum(sf1_q.values()), 3),
                "warm_total_norm_sec": round(
                    sum(sf1_q.values()) * (CALIB_REF_SEC / sf1_calib), 3
                ),
            }
            print(f"# headline sf1.0: {headline_sf1}", file=sys.stderr)

    # Web-curation wave (round 8): the archive→text stage queries at the gate
    # scale, profile-only (the stdout line has a hard char budget; these are
    # regression-watched via BENCH_PROFILE like the sf1 wave). Default-on —
    # the whole wave is a few seconds warm.
    web_wave = None
    if os.environ.get("SPARK_GRAFT_WEB_WAVE", "1") == "1":
        _WEB_WAVE_QUERIES = (
            "doc_html_extract",
            "doc_html_link_stats",
            "doc_warc_extract",
            "doc_warc_gz_extract",  # round 9: gzip-member framing
            "doc_wet_pipeline",
            "doc_gopher_repetition",
            "doc_url_blocklist_filter",
            "doc_robots_filter",  # round 9: RFC 9309 politeness filter
            "doc_language_id_clf",  # round 9: trained langid tier (10-lang round 10)
            "doc_corpus_release",  # round 10: end-to-end shards->dataset-card
        )
        web_calib = calibration(spark, runs_out=calib_runs.setdefault("web", []))
        web_q = {}
        for name in _WEB_WAVE_QUERIES:
            q = registry[name]
            q.fn(spark, sf_dir).count()  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            web_q[name] = round(statistics.median(runs), 3)
        web_wave = {
            "calib_sec": web_calib,
            "queries": web_q,
            "warm_total_sec": round(sum(web_q.values()), 3),
            "warm_total_norm_sec": round(
                sum(web_q.values()) * (CALIB_REF_SEC / web_calib), 3
            ),
        }
        print(f"# web wave: {web_wave}", file=sys.stderr)

    # Training-data wave (round 10 second wave): the packing / contamination /
    # FIM / bitext queries at the gate scale, profile-only like the web wave.
    # Default-on — a few seconds warm except the exact bitext arm (~4 s: the
    # all-pairs recall baseline, quadratic by design and measured as such).
    training_wave = None
    if os.environ.get("SPARK_GRAFT_TRAINING_WAVE", "1") == "1":
        _TRAINING_WAVE_QUERIES = (
            "doc_context_packing",
            "doc_context_chunks",
            "doc_contaminated_chunks",
            "doc_curriculum_packing",
            "doc_fim_split",
            "embedding_bitext_mining",
            "embedding_bitext_lsh",
            "embedding_bitext_lsh_recall",
            # doc_crosslingual_mining stays out of the wave: its exact arm is
            # ~20 s at the gate scale (positive-cosine keeps ~every pair on
            # this shared-vocab fixture — zero selectivity, quadratic by
            # design; SCALING.md documents the curve and the LSH contract)
        )
        training_calib = calibration(spark, runs_out=calib_runs.setdefault("training", []))
        training_q = {}
        for name in _TRAINING_WAVE_QUERIES:
            q = registry[name]
            q.fn(spark, sf_dir).count()  # warmup
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            training_q[name] = round(statistics.median(runs), 3)
        training_wave = {
            "calib_sec": training_calib,
            "queries": training_q,
            "warm_total_sec": round(sum(training_q.values()), 3),
            "warm_total_norm_sec": round(
                sum(training_q.values()) * (CALIB_REF_SEC / training_calib), 3
            ),
        }
        print(f"# training wave: {training_wave}", file=sys.stderr)

    # Shard-ingestion wave (round 10): the 100-TB ingestion mouth, measured —
    # pack one .warc.gz shard FILE per hash bucket from the gate-scale corpus
    # (member-per-document gzip concatenation, the Common Crawl framing), then
    # drive files → wet_shard_batch (walk + extract + score + store landing)
    # → read_wet_store merge. Records wall per phase, per-shard doc balance,
    # and the binaryFile scan's task fan-out (at real ~1 GiB CC shards this is
    # one task per shard; at bench-size shards Spark bin-packs small files —
    # also the right behavior at scale). Local-mode note: tasks write shard
    # files to a local temp dir; a cluster would target shared storage.
    # Profile-only, default-on (a few seconds at sf0.1).
    shard_wave = None
    if os.environ.get("SPARK_GRAFT_SHARD_WAVE", "1") == "1":
        import shutil as _shutil
        import tempfile as _tempfile

        from clickhouse_etl_loadtest_spark.operators.wetstream import (
            read_wet_store,
            wet_shard_batch,
        )
        from clickhouse_etl_loadtest_spark.queries.html import _warc_col

        n_shards = int(os.environ.get("SPARK_GRAFT_SHARD_COUNT", "32"))
        shard_dir = _tempfile.mkdtemp(prefix="bench-shards-")
        store_dir = _tempfile.mkdtemp(prefix="bench-shardstore-")
        try:
            shard_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                (F.col("doc_id") % n_shards).cast("int").alias("shard"),
                _warc_col().alias("warc"),
            )

            def _write_shard(pdf):
                import pandas as pd

                from clickhouse_etl_loadtest_spark.operators.warc import gzip_member

                s = int(pdf["shard"].iloc[0])
                blob = b"".join(
                    gzip_member(b.encode("utf-8")) for b in pdf["warc"]
                )
                with open(f"{shard_dir}/shard-{s:05d}.warc.gz", "wb") as f:
                    f.write(blob)
                return pd.DataFrame(
                    [(s, len(pdf), len(blob))], columns=["shard", "n_docs", "n_bytes"]
                )

            t0 = time.perf_counter()
            manifest = (
                shard_docs.groupBy("shard")
                .applyInPandas(_write_shard, "shard int, n_docs long, n_bytes long")
                .collect()
            )
            pack_sec = round(time.perf_counter() - t0, 3)
            bin_df = (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.warc.gz")
                .load(shard_dir)
                .select(F.col("content").alias("warc"))
            )
            scan_tasks = bin_df.rdd.getNumPartitions()
            t0 = time.perf_counter()
            wet_shard_batch(bin_df, store_dir, 0)
            ingest_sec = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            merged_docs = read_wet_store(spark, store_dir).count()
            merge_sec = round(time.perf_counter() - t0, 3)
            sizes = sorted(r["n_docs"] for r in manifest)
            shard_wave = {
                "n_shards": len(manifest),
                "docs": int(sum(sizes)),
                "merged_docs": int(merged_docs),
                "bytes": int(sum(r["n_bytes"] for r in manifest)),
                "pack_sec": pack_sec,
                "ingest_sec": ingest_sec,
                "merge_sec": merge_sec,
                "scan_tasks": scan_tasks,
                "docs_per_shard_min": int(sizes[0]),
                "docs_per_shard_max": int(sizes[-1]),
            }
            print(f"# shard wave: {shard_wave}", file=sys.stderr)
        finally:
            _shutil.rmtree(shard_dir, ignore_errors=True)
            _shutil.rmtree(store_dir, ignore_errors=True)

    # >2 GiB single-shard chunked-reader proof — opt-in (build + two reads
    # cost minutes); carried forward in the profile like the 100M wave
    bigshard_wave = None
    if os.environ.get("SPARK_GRAFT_BIGSHARD", "0") == "1":
        bigshard_wave = run_bigshard_wave(spark)

    # Composed streaming tier at bench scale (round 12): curate_and_pack as
    # a real multi-wave drive. Default-on small (6 waves x 2 replicas of the
    # gate corpus, ~1 min); the 20M-token regime (32 waves x 4 replicas) is
    # opt-in and carries forward like the other expensive waves.
    packstream_wave = None
    if os.environ.get("SPARK_GRAFT_PACKSTREAM_WAVE", "1") == "1":
        packstream_wave = run_packstream_wave(
            spark, sf_dir, n_waves=6, replicas=2, compact_after=2
        )
        print(f"# packstream wave: {packstream_wave}", file=sys.stderr)
    packstream_wave_20m = None
    if os.environ.get("SPARK_GRAFT_PACKSTREAM_20M", "0") == "1":
        packstream_wave_20m = run_packstream_wave(
            spark, sf_dir, n_waves=32, replicas=4
        )
        print(f"# packstream wave 20M: {packstream_wave_20m}", file=sys.stderr)

    # Incremental SemDeDup at bench scale (round 12): default-on over the
    # gate fixture's embeddings; the sf1.0 variant (20k vectors) is opt-in
    # and needs the /tmp/scale fixture.
    semstream_wave = None
    semstream_wave_bounded = None
    if os.environ.get("SPARK_GRAFT_SEMSTREAM_WAVE", "1") == "1":
        # exact-parity mode, with a mid-drive store compaction (round 13:
        # the continuing waves and replay must be compaction-oblivious)
        semstream_wave = run_semstream_wave(spark, sf_dir, n_waves=8, compact_after=3)
        print(f"# semstream wave: {semstream_wave}", file=sys.stderr)
        # bounded (kept-representatives) mode over the SAME wave split: the
        # per-wave walls and keep counts sit beside the exact mode's, and
        # the drop-recall delta is recorded explicitly
        semstream_wave_bounded = run_semstream_wave(
            spark, sf_dir, n_waves=8, compare="kept"
        )
        de = semstream_wave["vectors"] - semstream_wave["kept_rows"]
        db = semstream_wave_bounded["vectors"] - semstream_wave_bounded["kept_rows"]
        semstream_wave_bounded["drop_recall_vs_exact"] = (
            round(db / de, 4) if de else None
        )
        print(f"# semstream wave bounded: {semstream_wave_bounded}", file=sys.stderr)
    # Incremental fuzzy dedup (band index) wave: default-on like the other
    # store drives — every persistent store's compaction now runs mid-drive
    # in the default bench (wet+pack inside packstream, semstream above,
    # band index here).
    fuzzystream_wave = None
    if os.environ.get("SPARK_GRAFT_FUZZYSTREAM_WAVE", "1") == "1":
        fuzzystream_wave = run_fuzzystream_wave(
            spark, sf_dir, n_waves=6, compact_after=2
        )
        print(f"# fuzzystream wave: {fuzzystream_wave}", file=sys.stderr)

    semstream_wave_sf1 = None
    semstream_wave_sf1_bounded = None
    semstream_wave_sf1_dupheavy = None
    semstream_wave_sf1_dupheavy_bounded = None
    semstream_wave_sf1_k64 = None
    if os.environ.get("SPARK_GRAFT_SEMSTREAM_SF1", "0") == "1":
        _ss_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/scale/sf1.0")
        if os.path.exists(f"{_ss_dir}/embeddings.parquet"):
            # the scale fixture is 8 TIGHT clusters (within-cluster cosine
            # ~0.99, planted ~2% near-dups at ~0.9999999) - at the
            # near-orthogonal fixture's 0.40 threshold everything within a
            # cluster collapses (kept ~0); 0.999 drops only the planted
            # dups, same join volume, meaningful keep semantics
            semstream_wave_sf1 = run_semstream_wave(
                spark, _ss_dir, n_waves=16, threshold=0.999
            )
            print(f"# semstream wave sf1: {semstream_wave_sf1}", file=sys.stderr)
            # bounded mode on the SAME 16-wave drive. Honest semantics: the
            # kept-compare is O(survivor store), so on THIS regime (97.8%
            # keep — the post-dedup corpus itself grows linearly) both walls
            # grow; what the bounded mode removes is the DROPPED mass from
            # the compare set, which is the whole point in the regime below
            semstream_wave_sf1_bounded = run_semstream_wave(
                spark, _ss_dir, n_waves=16, threshold=0.999, compare="kept"
            )
            de = semstream_wave_sf1["vectors"] - semstream_wave_sf1["kept_rows"]
            db = (
                semstream_wave_sf1_bounded["vectors"]
                - semstream_wave_sf1_bounded["kept_rows"]
            )
            semstream_wave_sf1_bounded["drop_recall_vs_exact"] = (
                round(db / de, 4) if de else None
            )
            print(
                f"# semstream wave sf1 bounded: {semstream_wave_sf1_bounded}",
                file=sys.stderr,
            )
            # dup-heavy regime — the bounded mode's reason to exist. At 0.40
            # every cluster collapses to its first arrival (kept ~= k rows
            # TOTAL), the regime where a stream actually needs bounding
            # (seen >> kept): the exact mode still pays O(all seen history)
            # per wave while the survivor-only compare is O(k) — FLAT
            semstream_wave_sf1_dupheavy = run_semstream_wave(
                spark, _ss_dir, n_waves=16, threshold=0.40
            )
            print(
                f"# semstream wave sf1 dup-heavy: {semstream_wave_sf1_dupheavy}",
                file=sys.stderr,
            )
            semstream_wave_sf1_dupheavy_bounded = run_semstream_wave(
                spark, _ss_dir, n_waves=16, threshold=0.40, compare="kept"
            )
            de = (
                semstream_wave_sf1_dupheavy["vectors"]
                - semstream_wave_sf1_dupheavy["kept_rows"]
            )
            db = (
                semstream_wave_sf1_dupheavy_bounded["vectors"]
                - semstream_wave_sf1_dupheavy_bounded["kept_rows"]
            )
            semstream_wave_sf1_dupheavy_bounded["drop_recall_vs_exact"] = (
                round(db / de, 4) if de else None
            )
            print(
                "# semstream wave sf1 dup-heavy bounded: "
                f"{semstream_wave_sf1_dupheavy_bounded}",
                file=sys.stderr,
            )
            # the OTHER dial for the keep-heavy regime: when the post-dedup
            # corpus itself grows (nothing to bound by dropping), the
            # SemDeDup contract is "raise k so clusters stay bounded" — the
            # per-wave compare is O(wave x kept/k), so an 8x larger codebook
            # should cut the wall slope ~8x on the SAME drive (production
            # combo: bounded compare + bigger codebook)
            semstream_wave_sf1_k64 = run_semstream_wave(
                spark, _ss_dir, n_waves=16, threshold=0.999, k=64, compare="kept"
            )
            print(
                f"# semstream wave sf1 k64: {semstream_wave_sf1_k64}",
                file=sys.stderr,
            )
        else:
            print(f"# semstream sf1 wave skipped: no {_ss_dir}", file=sys.stderr)

    crash_recovery = None
    if os.environ.get("SPARK_GRAFT_CRASH_RECOVERY_20M", "0") == "1":
        import tempfile as _tempfile
        import shutil as _shutil

        from clickhouse_etl_loadtest_spark.streaming.recovery import crash_recovery_wave

        _cr_work = _tempfile.mkdtemp(prefix="bench-crash-recovery-")
        try:
            crash_recovery = crash_recovery_wave(
                _cr_work,
                total_records=20_000_000,
                staging_files=32,
                files_per_trigger=4,
                kill_after_commits=3,
            )
            print(f"# crash recovery 20M: {crash_recovery}", file=sys.stderr)
        finally:
            _shutil.rmtree(_cr_work, ignore_errors=True)

    # Crash recovery at the 100M state scale (SPARK_GRAFT_CRASH_RECOVERY_100M=1):
    # same harness, 5x the records — the kill lands with ~34M keys already in
    # RocksDB state, so run 2 measures changelog state-RESTORE at real volume,
    # not just WAL replumbing. Cost ~10 min; carried forward like the 100M wave.
    crash_recovery_100m = None
    if os.environ.get("SPARK_GRAFT_CRASH_RECOVERY_100M", "0") == "1":
        import tempfile as _tempfile
        import shutil as _shutil

        from clickhouse_etl_loadtest_spark.streaming.recovery import crash_recovery_wave

        _cr_work = _tempfile.mkdtemp(prefix="bench-crash-recovery-100m-")
        try:
            crash_recovery_100m = crash_recovery_wave(
                _cr_work,
                total_records=100_000_000,
                staging_files=32,
                files_per_trigger=4,
                kill_after_commits=3,
                timeout_s=3600.0,
            )
            print(f"# crash recovery 100M: {crash_recovery_100m}", file=sys.stderr)
        finally:
            _shutil.rmtree(_cr_work, ignore_errors=True)

    calib["end_sec"] = calibration(spark, runs_out=calib_runs.setdefault("end", []))
    calib["runs"] = calib_runs  # per-wave raw runs: skew is data, not mystery
    # the 20M wave sits between the stream and end calibrations; normalize by
    # the slower of the two (conservative: never makes the wave look better
    # than the worst host state that bracketed it)
    stream_factor = CALIB_REF_SEC / max(calib["stream_sec"], calib["end_sec"])
    if streaming_20m is not None:
        streaming_20m["duration_sec_norm"] = round(
            streaming_20m["duration_sec"] * stream_factor, 1
        )
    if streaming_100m is not None:
        streaming_100m["duration_sec_norm"] = round(
            streaming_100m["duration_sec"] * stream_factor, 1
        )

    # Streaming-wave delta vs the previous round, keyed on WORK — see
    # stream20m_delta for the classification rules.
    streaming_delta = None
    if streaming_20m is not None and (prev_profile or {}).get("streaming_loadtest_20m"):
        streaming_delta = stream20m_delta(
            streaming_20m, prev_profile["streaming_loadtest_20m"]
        )
        if not streaming_delta["noise"]:
            noise_flags.append("streaming_loadtest_20m")

    # Rewrite the committed profile with the FULL diagnostics (spread,
    # stage-CPU, deltas, loadtest + streaming detail, calibration). The
    # round-end commit makes the driver's own run the next round's delta
    # baseline; `best` carries the best warm total ever observed as a
    # separate field (round-4 lesson: best-of-round is advocacy, not a
    # baseline).
    best = (prev_profile or {}).get("best")
    if not best or total_norm < best.get("warm_total_norm_sec", float("inf")):
        best = {
            "warm_total_sec": total,
            "warm_total_norm_sec": total_norm,
            "cold_total_sec": cold_total,
            "calib_queries_sec": calib["queries_sec"],
        }
    with open(PROFILE_PATH, "w") as f:
        json.dump(
            {
                "queries": {
                    name: {
                        "warm_median_sec": timings[name],
                        "warm_median_norm_sec": timings_norm[name],
                        "warm_stdev_sec": spread[name]["stdev"],
                        "cold_sec": cold[name],
                        "stage_cpu_ms": stage_cpu.get(name),
                    }
                    for name in timings
                },
                "warm_total_sec": total,
                "warm_total_norm_sec": total_norm,
                "cold_total_sec": cold_total,
                "warm_runs": WARM_RUNS,
                "calibration": calib,
                "queries_spread": spread,
                "profile_delta_vs_prev_round": profile_delta,
                "streaming_delta_vs_prev_round": streaming_delta,
                "loadtest_5m": loadtest,
                "loadtest_5m_steady": loadtest_steady,
                "loadtest_5m_by_processes": sweep or None,
                "streaming_loadtest_1m": streaming,
                "streaming_loadtest_20m": streaming_20m,
                # carry the last opt-in 100M state-scaling run forward so a
                # non-opt-in (driver) rewrite doesn't erase the evidence;
                # stamp the copy so it can't read as a fresh measurement
                "streaming_loadtest_100m": streaming_100m
                if streaming_100m is not None
                else _carried_forward((prev_profile or {}).get("streaming_loadtest_100m")),
                "crash_recovery_20m": crash_recovery
                if crash_recovery is not None
                else _carried_forward((prev_profile or {}).get("crash_recovery_20m")),
                "crash_recovery_100m": crash_recovery_100m
                if crash_recovery_100m is not None
                else _carried_forward((prev_profile or {}).get("crash_recovery_100m")),
                "headline_sf1": headline_sf1
                if headline_sf1 is not None
                else _carried_forward((prev_profile or {}).get("headline_sf1")),
                "web_wave": web_wave
                if web_wave is not None
                else _carried_forward((prev_profile or {}).get("web_wave")),
                "training_wave": training_wave
                if training_wave is not None
                else _carried_forward((prev_profile or {}).get("training_wave")),
                "shard_wave": shard_wave
                if shard_wave is not None
                else _carried_forward((prev_profile or {}).get("shard_wave")),
                "bigshard_wave": bigshard_wave
                if bigshard_wave is not None
                else _carried_forward((prev_profile or {}).get("bigshard_wave")),
                "packstream_wave": packstream_wave
                if packstream_wave is not None
                else _carried_forward((prev_profile or {}).get("packstream_wave")),
                "packstream_wave_20m": packstream_wave_20m
                if packstream_wave_20m is not None
                else _carried_forward((prev_profile or {}).get("packstream_wave_20m")),
                "fuzzystream_wave": fuzzystream_wave
                if fuzzystream_wave is not None
                else _carried_forward((prev_profile or {}).get("fuzzystream_wave")),
                "semstream_wave": semstream_wave
                if semstream_wave is not None
                else _carried_forward((prev_profile or {}).get("semstream_wave")),
                "semstream_wave_bounded": semstream_wave_bounded
                if semstream_wave_bounded is not None
                else _carried_forward(
                    (prev_profile or {}).get("semstream_wave_bounded")
                ),
                "semstream_wave_sf1": semstream_wave_sf1
                if semstream_wave_sf1 is not None
                else _carried_forward((prev_profile or {}).get("semstream_wave_sf1")),
                "semstream_wave_sf1_bounded": semstream_wave_sf1_bounded
                if semstream_wave_sf1_bounded is not None
                else _carried_forward(
                    (prev_profile or {}).get("semstream_wave_sf1_bounded")
                ),
                "semstream_wave_sf1_dupheavy": semstream_wave_sf1_dupheavy
                if semstream_wave_sf1_dupheavy is not None
                else _carried_forward(
                    (prev_profile or {}).get("semstream_wave_sf1_dupheavy")
                ),
                "semstream_wave_sf1_dupheavy_bounded": semstream_wave_sf1_dupheavy_bounded
                if semstream_wave_sf1_dupheavy_bounded is not None
                else _carried_forward(
                    (prev_profile or {}).get("semstream_wave_sf1_dupheavy_bounded")
                ),
                "semstream_wave_sf1_k64": semstream_wave_sf1_k64
                if semstream_wave_sf1_k64 is not None
                else _carried_forward(
                    (prev_profile or {}).get("semstream_wave_sf1_k64")
                ),
                "best": best,
            },
            f,
            indent=1,
        )

    # ONE compact stdout line for the driver. Hard budget: the driver parses
    # the JSON out of a ~2000-char stdout tail — round 4's line outgrew it
    # and the official bench recorded `parsed: null`. Full diagnostics live
    # in BENCH_PROFILE.json (committed); this line carries only the numbers
    # the gates read, raw AND normalized.
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_sec",
        "value": total,
        "value_norm": total_norm,
        "unit": "sec",
        "queries": timings,
        "queries_norm": timings_norm,
        "cold_value": cold_total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # per-wave raw calibration runs stay in the profile: the stdout line
        # has a hard ~1800-char budget (round-4 lesson: parsed null)
        "calib": {k: v for k, v in calib.items() if k != "runs"},
        "noise_flags": noise_flags,
        "loadtest_5m": _compact_loadtest(loadtest),
        "loadtest_5m_steady": _compact_loadtest(loadtest_steady),
        "sweep_glassflow_rps": {p: r["glassflow_rps"] for p, r in sweep.items()} or None,
        "streaming_loadtest_1m": _compact_loadtest(streaming),
        "streaming_loadtest_20m": _compact_stream20m(streaming_20m),
        "detail": "BENCH_PROFILE.json",
    }
    if streaming_100m is not None:
        out["streaming_loadtest_100m"] = _compact_stream20m(streaming_100m)
    if headline_sf1 is not None:
        out["headline_sf1"] = {
            k: headline_sf1[k] for k in ("warm_total_sec", "warm_total_norm_sec")
        }
    if crash_recovery is not None:
        out["crash_recovery_20m"] = {
            k: crash_recovery[k]
            for k in ("success", "commits_at_kill", "recovered_batches", "wall_run2_sec")
        }
    if crash_recovery_100m is not None:
        out["crash_recovery_100m"] = {
            k: crash_recovery_100m[k]
            for k in ("success", "commits_at_kill", "recovered_batches", "wall_run2_sec")
        }
    line = json.dumps(out, separators=(",", ":"))
    for drop in ("queries_norm", "sweep_glassflow_rps", "calib", "noise_flags"):
        if len(line) <= 1800:
            break
        out.pop(drop, None)
        line = json.dumps(out, separators=(",", ":"))
    print(f"# stdout line length: {len(line)} chars (budget 1800)", file=sys.stderr)
    print(line)
    spark.stop()


def _tail_over_head(per_wall: list) -> float:
    """Median(tail)/median(head) of a per-wave wall series, DROPPING wave 0
    from the head window when enough waves remain: the first wave carries
    JVM/JIT warmup (the project's documented calibration pitfall), and an
    inflated head understates exactly the growth this ratio exists to
    expose."""
    walls = per_wall[1:] if len(per_wall) >= 4 else list(per_wall)
    head = walls[: max(1, min(3, len(walls) // 2))]
    tail = walls[-len(head):]
    return round(statistics.median(tail) / statistics.median(head), 3)


def _carried_forward(r: dict | None) -> dict | None:
    """Stamp a profile entry copied from the previous round's BENCH_PROFILE so
    it is distinguishable from a measurement taken in the current run."""
    if r is None:
        return None
    out = dict(r)
    out["carried_forward"] = True
    return out


def run_packstream_wave(
    spark, sf_dir: str, n_waves: int = 6, replicas: int = 2, compact_after: int | None = None
) -> dict:
    """The composed streaming tier at bench scale: drive the shards→trainer
    chain (``operators/packstream.py::curate_and_pack_batch`` — WARC walk →
    extract → quality/langid → store landing → fingerprint novelty →
    incremental pack) through ``n_waves`` REAL waves against one persistent
    state, the regime the snapshot recipe exists for.

    Each wave carries ``replicas`` copies of the gate corpus: replica 0
    keeps the SAME doc_ids and text every wave (a steady re-crawl — store
    verdicts overwrite per wave, nothing re-packs), replicas >= 1 are
    salted unique per (wave, replica) (fresh content — every
    quality-passing doc packs). So every wave exercises all three store
    paths at once (fresh landing, re-crawl overwrite, novelty pack) while
    the store, manifest, and cursor grow wave over wave.

    Recorded: per-wave wall (the growth curve IS the measurement — each
    wave re-reads the store's fixed-width verdict rows for the novelty
    anti-join, O(store) by design, so wall should grow gently and
    linearly, never super-linearly), packed docs + cursor per wave, final
    store/manifest size on disk, and the REPLAY cost of re-delivering the
    last wave (must be idempotent: same info dict, same manifest)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.operators.packstream import (
        curate_and_pack_batch,
        read_manifest,
    )
    from clickhouse_etl_loadtest_spark.queries.html import _warc_col

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    stride = 100_000_000  # doc_id offset per replica slot (fixture ids are tiny)
    wet_store = _tempfile.mkdtemp(prefix="bench-packstream-wet-")
    pack_state = _tempfile.mkdtemp(prefix="bench-packstream-pack-")

    def wave_frame(w: int):
        parts = []
        for r in range(replicas):
            # replica 0: one fixed id block + fixed salt (the steady
            # re-crawl); others: a fresh id block and salt per wave
            off = stride if r == 0 else stride * (2 + w * (replicas - 1) + (r - 1))
            salt = " steady" if r == 0 else f" w{w}r{r}"
            parts.append(
                base.withColumn("doc_id", (F.col("doc_id") + off).cast("long"))
                .withColumn("text", F.concat(F.col("text"), F.lit(salt)))
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.select("doc_id", _warc_col().alias("warc"))

    try:
        per_wall, per_packed, per_cursor = [], [], []
        compaction = None
        for w in range(n_waves):
            wdf = wave_frame(w)
            t0 = time.perf_counter()
            info = curate_and_pack_batch(spark, wdf, wet_store, pack_state, w)
            per_wall.append(round(time.perf_counter() - t0, 3))
            per_packed.append(int(info["n_docs"]))
            per_cursor.append(int(info["end"]))
            if compact_after is not None and w == compact_after:
                # mid-drive store maintenance: fold both persistent stores
                # at the floor and keep driving — the manifest/cursor and
                # every later wave must be byte-identical to an uncompacted
                # drive (pinned by tests; here the continuity IS the check)
                from clickhouse_etl_loadtest_spark.operators.packstream import (
                    compact_pack_state,
                )
                from clickhouse_etl_loadtest_spark.operators.wetstream import (
                    compact_wet_store,
                )

                t0 = time.perf_counter()
                wet_info = compact_wet_store(spark, wet_store, upto_batch_id=w)
                pack_info = compact_pack_state(spark, pack_state, upto_batch_id=w)
                compaction = {
                    "after_wave": w,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    "wet": wet_info,
                    "pack_manifest_rows": pack_info["manifest_rows"],
                }
        store_rows = spark.read.parquet(wet_store).count()
        manifest_rows = read_manifest(spark, pack_state).count()

        # post-crash re-delivery of the last wave: same info, same manifest
        wdf = wave_frame(n_waves - 1)
        t0 = time.perf_counter()
        replay = curate_and_pack_batch(
            spark, wdf, wet_store, pack_state, n_waves - 1
        )
        replay_sec = round(time.perf_counter() - t0, 3)
        replay_equal = (
            int(replay["end"]) == per_cursor[-1]
            and int(replay["n_docs"]) == per_packed[-1]
            and read_manifest(spark, pack_state).count() == manifest_rows
            and spark.read.parquet(wet_store).count() == store_rows
        )

        def _du(path: str) -> int:
            tot = 0
            for dirpath, _, files in os.walk(path):
                for fn in files:
                    tot += os.path.getsize(os.path.join(dirpath, fn))
            return tot

        return {
            "n_waves": n_waves,
            "replicas": replicas,
            "docs_per_wave": int(n_base * replicas),
            "per_wave_wall_sec": per_wall,
            "wall_tail_over_head": _tail_over_head(per_wall),
            "packed_docs_per_wave": per_packed,
            "packed_docs_total": int(sum(per_packed)),
            "final_cursor_tokens": per_cursor[-1],
            "store_rows": int(store_rows),
            "manifest_rows": int(manifest_rows),
            "wet_store_bytes": _du(wet_store),
            "pack_state_bytes": _du(pack_state),
            "replay_sec": replay_sec,
            "replay_equal": bool(replay_equal),
            "compaction": compaction,
        }
    finally:
        _shutil.rmtree(wet_store, ignore_errors=True)
        _shutil.rmtree(pack_state, ignore_errors=True)


def run_semstream_wave(
    spark,
    sf_dir: str,
    n_waves: int = 8,
    k: int = 8,
    threshold: float | None = None,
    compare: str = "all",
    compact_after: int | None = None,
) -> dict:
    """Incremental SemDeDup at bench scale: split the fixture's embedding
    corpus into ``n_waves`` vec_id-ordered waves and fold them through
    ``operators/semstream.py::semdedup_batch`` against ONE pinned codebook
    (trained on the first wave's k lowest-vec_id vectors — the operator's
    documented init rule) with the round-12 drift yardstick attached.

    The scale question this answers: per-wave wall GROWS with the store in
    the exact-parity mode (each wave compares against every SEEN
    same-cluster vector — Σ n_c x wave work, linear in history by design);
    ``compare="kept"`` drives the round-13 bounded mode (survivors-only
    compare, O(post-dedup corpus) per wave) against the SAME wave split so
    the two walls and keep counts sit side by side in the profile. So the
    record keeps the whole wall sequence plus the tail/head ratio, the
    per-wave drift metrics (same-distribution waves must NOT flag), and the
    replay cost of the last wave (identical store required).
    ``compact_after`` folds the store mid-drive (``compact_sem_store``) —
    the continuing waves and replay must be oblivious."""
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.operators.semstream import (
        codebook_ref_stats,
        compact_sem_store,
        read_semdedup_store,
        semdedup_batch,
    )
    from clickhouse_etl_loadtest_spark.queries.vector import _NEAR_DUP_THRESHOLD

    if threshold is None:
        threshold = _NEAR_DUP_THRESHOLD
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    n_vec = emb.count()
    per = -(-n_vec // n_waves)
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(k).collect()
    ]
    bounds = [r["vec_id"] for r in emb.orderBy("vec_id").select("vec_id").collect()][
        ::per
    ] + [None]
    n_waves = len(bounds) - 1  # uneven splits shrink the last stride
    first = emb.where(F.col("vec_id") < bounds[1]) if bounds[1] is not None else emb
    ref = codebook_ref_stats(first, centroids)

    state = _tempfile.mkdtemp(prefix="bench-semstream-")
    try:
        walls, infos = [], []
        compaction = None
        for w in range(n_waves):
            lo, hi = bounds[w], bounds[w + 1]
            wave = emb.where(F.col("vec_id") >= lo)
            if hi is not None:
                wave = wave.where(F.col("vec_id") < hi)
            t0 = time.perf_counter()
            info = semdedup_batch(
                spark, wave, state, w, centroids, threshold, ref_stats=ref,
                compare=compare,
            )
            walls.append(round(time.perf_counter() - t0, 3))
            infos.append(info)
            if compact_after is not None and w == compact_after:
                t0 = time.perf_counter()
                cinfo = compact_sem_store(spark, state, upto_batch_id=w)
                compaction = {
                    "after_wave": w,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    **cinfo,
                }
        store = read_semdedup_store(spark, state)
        store_rows = store.count()
        kept_rows = store.where("keep").count()
        # replay the last wave: identical info and store row count required
        lo = bounds[n_waves - 1]
        wave = emb.where(F.col("vec_id") >= lo)
        if bounds[n_waves] is not None:
            wave = wave.where(F.col("vec_id") < bounds[n_waves])
        t0 = time.perf_counter()
        replay = semdedup_batch(
            spark, wave, state, n_waves - 1, centroids, threshold, ref_stats=ref,
            compare=compare,
        )
        replay_sec = round(time.perf_counter() - t0, 3)
        return {
            "n_waves": n_waves,
            "k": k,
            "threshold": threshold,
            "compare": compare,
            "compaction": compaction,
            "vectors": int(n_vec),
            "per_wave_wall_sec": walls,
            "wall_tail_over_head": _tail_over_head(walls),
            "kept_per_wave": [i["kept"] for i in infos],
            "store_rows": int(store_rows),
            "kept_rows": int(kept_rows),
            "mean_dist2_per_wave": [round(i["mean_dist2"], 4) for i in infos],
            "drift_flags": [bool(i["drift_flagged"]) for i in infos],
            "replay_sec": replay_sec,
            "replay_equal": bool(
                replay == infos[-1]
                and read_semdedup_store(spark, state).count() == store_rows
            ),
        }
    finally:
        _shutil.rmtree(state, ignore_errors=True)


def run_fuzzystream_wave(
    spark, sf_dir: str, n_waves: int = 6, compact_after: int | None = None
) -> dict:
    """Incremental MinHash-LSH dedup at bench scale: split the fixture's
    document corpus into ``n_waves`` doc_id-ordered waves and admit each
    through ``operators/fuzzydedup.py::admit_batch`` against ONE persistent
    band index. Every wave is a mix of a FRESH slice and a re-crawl REPLICA
    of the previous wave's slice (identical text, re-keyed ids — the
    packstream wave's steady-re-crawl shape): a replica's band set is
    byte-identical to its original's, so every replica must collide with
    the index and admit ZERO rows (``admitted_replica_per_wave`` records
    the invariant as data). The scale question: per-wave cost is the
    band-keyed anti-join against a growing hashes-only index (text never
    lands in the index), so the wall should track the wave, not the
    corpus. ``compact_after`` folds the index mid-drive
    (``compact_band_index``) — continuing admissions and the replay must
    be oblivious. Replaying the last wave (same ``batch_id``) must admit
    the identical id set against the identical index row count."""
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.operators.fuzzydedup import (
        admit_batch,
        compact_band_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ids = [r["doc_id"] for r in docs.orderBy("doc_id").select("doc_id").collect()]
    n_docs = len(ids)
    per = -(-n_docs // n_waves)
    bounds = ids[::per] + [None]
    n_waves = len(bounds) - 1
    _REPLICA_OFFSET = 100_000_000

    def fresh_slice(w: int):
        lo, hi = bounds[w], bounds[w + 1]
        s = docs.where(F.col("doc_id") >= lo)
        return s.where(F.col("doc_id") < hi) if hi is not None else s

    def batch_for(w: int):
        b = fresh_slice(w)
        if w > 0:
            replica = fresh_slice(w - 1).select(
                (F.col("doc_id") + _REPLICA_OFFSET + w * 1_000_000).alias("doc_id"),
                "text",
            )
            b = b.unionByName(replica)
        return b

    def admitted_stats(adm):
        r = adm.agg(
            F.count(F.when(F.col("doc_id") < _REPLICA_OFFSET, 1)).alias("fresh"),
            F.count(F.when(F.col("doc_id") >= _REPLICA_OFFSET, 1)).alias("replica"),
            F.sum("doc_id").alias("ck"),
        ).first()
        return int(r["fresh"]), int(r["replica"]), int(r["ck"] or 0)

    index_path = _tempfile.mkdtemp(prefix="bench-fuzzystream-")
    try:
        walls, fresh_adm, replica_adm = [], [], []
        compaction, last_ck = None, None
        for w in range(n_waves):
            t0 = time.perf_counter()
            adm = admit_batch(spark, batch_for(w), index_path, batch_id=w)
            f_n, r_n, last_ck = admitted_stats(adm)
            walls.append(round(time.perf_counter() - t0, 3))
            fresh_adm.append(f_n)
            replica_adm.append(r_n)
            if compact_after is not None and w == compact_after:
                t0 = time.perf_counter()
                cinfo = compact_band_index(spark, index_path, upto_batch_id=w)
                compaction = {
                    "after_wave": w,
                    "wall_sec": round(time.perf_counter() - t0, 3),
                    **cinfo,
                }
        index_rows = spark.read.parquet(index_path).count()
        t0 = time.perf_counter()
        replay = admit_batch(spark, batch_for(n_waves - 1), index_path, batch_id=n_waves - 1)
        rf, rr, rck = admitted_stats(replay)
        replay_sec = round(time.perf_counter() - t0, 3)
        return {
            "n_waves": n_waves,
            "documents": int(n_docs),
            "compaction": compaction,
            "per_wave_wall_sec": walls,
            "wall_tail_over_head": _tail_over_head(walls),
            "admitted_fresh_per_wave": fresh_adm,
            "admitted_replica_per_wave": replica_adm,
            "index_rows": int(index_rows),
            "replay_sec": replay_sec,
            "replay_equal": bool(
                (rf, rr, rck) == (fresh_adm[-1], replica_adm[-1], last_ck)
                and spark.read.parquet(index_path).count() == index_rows
            ),
        }
    finally:
        _shutil.rmtree(index_path, ignore_errors=True)


def run_bigshard_wave(spark, target_gib: float = 3.2, chunk_bytes: int = 256 << 20) -> dict:
    """Opt-in (SPARK_GRAFT_BIGSHARD=1): the >2 GiB chunked-reader proof at
    its actual regime. Builds ONE ``.warc.gz`` shard past the 2 GiB
    ``binaryFile`` byte-array ceiling — the size
    ``read_warc_documents_chunked`` exists for — then proves chunked ==
    whole-archive extraction there: a driver-side bounded-memory stream
    walk computes the ground truth (doc count + xor of h60(uri|html)) and
    the distributed chunked reader must reproduce both, on the fresh-index
    AND the persisted-index (cdx reuse) paths. Costs ~2 min + ~3.3 GiB of
    /tmp; the result carries forward in the profile like the other opt-in
    waves."""
    import gzip as _gzip
    import hashlib
    import math
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.functions.hashing import h60
    from clickhouse_etl_loadtest_spark.operators.warc import (
        http_body,
        iter_gzip_member_spans,
        iter_gzip_members,
        iter_warc_records,
    )
    from clickhouse_etl_loadtest_spark.sources.warcfiles import (
        read_warc_documents_chunked,
        warc_member_index,
    )

    member_raw = 3 << 20  # 3 MiB of random lowercase per response record
    d = tempfile.mkdtemp(prefix="bench-bigshard-")
    shard = f"{d}/big-00000.warc.gz"
    out: dict = {"target_chunk_bytes": chunk_bytes}
    try:
        # build: random lowercase barely compresses, so level-1 members land
        # ~0.8x raw; append until past the target (deterministic per-member
        # numpy streams — rebuildable bit-for-bit)
        t0 = time.perf_counter()
        written, n_members = 0, 0
        target = int(target_gib * (1 << 30))
        with open(shard, "wb") as f:
            while written < target:
                rng = np.random.default_rng(n_members)
                text = (
                    rng.integers(97, 123, size=member_raw, dtype=np.uint8)
                    .tobytes()
                    .decode()
                )
                uri = f"http://big.example.com/doc/{n_members}"
                payload = f"HTTP/1.1 200 OK\r\n\r\n<p>{text}</p>".encode()
                rec = (
                    f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}"
                    f"\r\nContent-Length: {len(payload)}\r\n\r\n"
                ).encode() + payload + b"\r\n\r\n"
                member = _gzip.compress(rec, compresslevel=1)
                f.write(member)
                written += len(member)
                n_members += 1
        out["build_sec"] = round(time.perf_counter() - t0, 1)
        out["shard_bytes"] = written
        out["n_members"] = n_members
        if written <= (2 << 30) + (64 << 20):
            raise AssertionError("bigshard fixture must clear the 2 GiB ceiling")

        # driver-side ground truth: one bounded-memory streaming pass (the
        # 'whole-archive extraction' a binaryFile reader CANNOT do here)
        t0 = time.perf_counter()
        n_docs, checksum = 0, 0
        with open(shard, "rb") as f:
            spans = list(iter_gzip_member_spans(f))
            for off, length in spans:
                f.seek(off)
                for m in iter_gzip_members(f.read(length)):
                    for rec in iter_warc_records(m):
                        if rec["headers"].get("warc-type") == "response":
                            uri = rec["headers"].get("warc-target-uri", "")
                            html = http_body(rec["payload"]).decode("utf-8", "replace")
                            checksum ^= int(
                                hashlib.md5(f"{uri}|{html}".encode()).hexdigest()[:15],
                                16,
                            )
                            n_docs += 1
        out["stream_truth_sec"] = round(time.perf_counter() - t0, 1)
        out["n_docs"] = n_docs
        out["n_chunks"] = math.ceil(written / chunk_bytes)

        def _agg(df):
            r = (
                df.select(h60(F.concat_ws("|", "target_uri", "html")).alias("h"))
                .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("chk"))
                .first()
            )
            return int(r["n"]), int(r["chk"])

        t0 = time.perf_counter()
        n1, c1 = _agg(read_warc_documents_chunked(spark, d, target_chunk_bytes=chunk_bytes))
        out["chunked_fresh_sec"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        warc_member_index(spark, d).write.mode("overwrite").parquet(f"{d}/index")
        out["index_build_sec"] = round(time.perf_counter() - t0, 1)
        idx = spark.read.parquet(f"{d}/index")
        t0 = time.perf_counter()
        n2, c2 = _agg(
            read_warc_documents_chunked(spark, d, target_chunk_bytes=chunk_bytes, index=idx)
        )
        out["chunked_index_reuse_sec"] = round(time.perf_counter() - t0, 1)

        out["equal"] = (n1, c1) == (n_docs, checksum) == (n2, c2)
        if not out["equal"]:
            raise AssertionError(
                f"bigshard mismatch: truth=({n_docs},{checksum}) "
                f"fresh=({n1},{c1}) reuse=({n2},{c2})"
            )
        print(f"# bigshard wave: {out}", file=sys.stderr)
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def query_delta(
    wall: float,
    wall_norm: float,
    run_stdev: float,
    q_factor: float,
    prev_factor: float | None,
    p: dict,
    cpu_ms: float | None,
) -> dict:
    """Classify one query's round-over-round delta against its committed
    profile row ``p``. Pure so the classification rules — especially the
    never-both invariant below — stay unit-testable."""
    d = {"wall_delta_sec": round(wall - p["warm_median_sec"], 3)}
    cpu_regressed = None
    if cpu_ms is not None and p.get("stage_cpu_ms") is not None:
        d["cpu_delta_ms"] = cpu_ms - p["stage_cpu_ms"]
        if p["stage_cpu_ms"]:
            d["cpu_delta_pct"] = round(100.0 * d["cpu_delta_ms"] / p["stage_cpu_ms"], 1)
        # work-based signal: executor run time is summed in-task work,
        # immune to the driver/JVM/page-cache swings that move walls
        # (round-9 lesson: normalized walls flagged +13% while every
        # CPU delta was flat-to-negative — calibration jitter). A
        # regression is only REAL-flagged when the work moved too.
        cpu_regressed = d["cpu_delta_ms"] > max(0.25 * p["stage_cpu_ms"], 150)
        d["cpu_regressed"] = cpu_regressed
    if prev_factor is not None:
        prev_norm = p.get(
            "warm_median_norm_sec", round(p["warm_median_sec"] * prev_factor, 3)
        )
        d["wall_delta_norm_sec"] = round(wall_norm - prev_norm, 3)
        # sigma floor at 20% of the profile median: a single capture's
        # in-run stdev understates the environmental envelope.
        # Measured round 5 on region_revenue with plan verification:
        # identical all-broadcast plans (no AQE strategy flip across
        # 10 runs, same code), fresh-session warm walls 1.16-1.84 s
        # (in-session 2*sigma ~= 30% of median) AND a
        # session-to-session median shift of +42% (0.92 -> ~1.31 s)
        # vs the profile's lucky-tight in-run sigma of 0.058 s.
        # Sub-second broadcast-heavy queries swing with JVM/GC and
        # page-cache state the sort+agg calibration can't see; below
        # ~±40% a one-run delta is indistinguishable from that
        # envelope, so only larger deltas earn a flag.
        d["noise"] = abs(d["wall_delta_norm_sec"]) <= 2 * max(
            run_stdev * q_factor,
            p.get("warm_stdev_sec", 0.0) * prev_factor,
            0.20 * prev_norm,
            0.05,  # floor: sub-50ms normalized deltas are scheduler jitter
        )
    else:
        d["noise"] = abs(d["wall_delta_sec"]) <= 2 * max(
            run_stdev, p.get("warm_stdev_sec", 0.0)
        )
    # noise classification keys on WORK when CPU data exists: a
    # wall-only regression with flat CPU is the environment
    if not d["noise"] and cpu_regressed is False:
        d["noise"] = True
        d["noise_reason"] = "wall regressed but stage-CPU flat"
    # ...and the converse is an INVARIANT, not a judgment call: a row must
    # never read cpu_regressed AND noise (round-10 lesson — the driver's run
    # emitted exactly that for dedup_pipeline_e2e, absorbing a CPU signal the
    # work-keyed rule exists to surface)
    if d["noise"] and cpu_regressed is True:
        d["noise"] = False
        d["noise_reason"] = (
            "disagreement: stage-CPU regressed though wall sits "
            "inside the noise envelope"
        )
    return d


def stream20m_delta(cur: dict, prev20: dict) -> dict:
    """Round-over-round delta for the 20M streaming wave, keyed on WORK (the
    state store's summed update time) — wall alone can neither flag nor
    clear this wave: RocksDB update time is the measured swing axis, and a
    work regression is never classified noise (same invariant as
    :func:`query_delta`)."""
    prev_ss = prev20.get("state_store") or {}
    cur_ss = cur.get("state_store") or {}
    d = {
        "wall_delta_sec": round(cur["duration_sec"] - prev20["duration_sec"], 1)
        if prev20.get("duration_sec") is not None
        else None,
        "wall_delta_norm_sec": round(
            cur["duration_sec_norm"] - prev20["duration_sec_norm"], 1
        )
        if prev20.get("duration_sec_norm") is not None
        and cur.get("duration_sec_norm") is not None
        else None,
        "baseline_carried_forward": bool(prev20.get("carried_forward")),
    }
    prev_upd = prev_ss.get("update_time_ms_sum")
    cur_upd = cur_ss.get("update_time_ms_sum")
    work_regressed = None
    if prev_upd and cur_upd is not None:
        d["update_time_delta_ms"] = cur_upd - prev_upd
        d["update_time_delta_pct"] = round(100.0 * (cur_upd - prev_upd) / prev_upd, 1)
        work_regressed = (cur_upd - prev_upd) > 0.25 * prev_upd
        d["work_regressed"] = work_regressed
    if work_regressed is True:
        d["noise"] = False
        pct = d.get("update_time_delta_pct")
        if pct is not None and abs(pct - 25.0) <= 5.0:
            d["noise_reason"] = (
                f"update time {pct:+.1f}% — work regression, but near the 25% "
                "threshold; probe before trusting (scripts/probe_stream20m.py)"
            )
        else:
            d["noise_reason"] = "state-store update time (work) regressed >25%"
    elif work_regressed is False:
        # near-boundary rule (round 13): a delta within 5pp of the 25%
        # threshold must NOT be labeled flat — the r12 +24.8% rise slid
        # under the gate as "update time flat", which overstated flatness.
        # The 3-run isolated probe (scripts/probe_stream20m.py) adjudicates.
        pct = d.get("update_time_delta_pct")
        if pct is not None and abs(pct - 25.0) <= 5.0:
            d["noise"] = True
            d["noise_reason"] = (
                f"update time {pct:+.1f}% — near the 25% work-regression "
                "threshold; probe before trusting (scripts/probe_stream20m.py)"
            )
        elif pct is not None and pct < -25.0:
            # symmetric honesty: a large improvement is not "flat" either —
            # name it, and leave adjudicating environment-vs-code to the
            # same probe a rise would get
            d["noise"] = True
            d["noise_reason"] = (
                f"update time {pct:+.1f}% (improved); wall movement is the "
                "environment"
            )
        else:
            d["noise"] = True
            d["noise_reason"] = "update time flat; wall movement is the environment"
    else:  # no state metrics on one side: fall back to normalized wall
        nd = d.get("wall_delta_norm_sec")
        base = prev20.get("duration_sec_norm") or 0
        d["noise"] = nd is None or abs(nd) <= max(0.20 * base, 2.0)
    return d


def _compact_loadtest(r: dict | None) -> dict | None:
    if r is None:
        return None
    return {
        "glassflow_rps": r["result_glassflow_rps"],
        "duration_sec": r["duration_sec"],
        "success": r["result_success"],
    }


def _compact_stream20m(r: dict | None) -> dict | None:
    if r is None:
        return None
    out = _compact_loadtest(r)
    out["duration_sec_norm"] = r.get("duration_sec_norm")
    out["cold_duration_sec"] = (r.get("cold_run") or {}).get("duration_sec")
    ss = r.get("state_store") or {}
    out["num_keys"] = ss.get("num_keys")
    out["update_time_ms_sum"] = ss.get("update_time_ms_sum")
    out["commit_time_ms_sum"] = ss.get("commit_time_ms_sum")
    return out


def run_loadtest(spark, total_records: int = 5_000_000, n_proc: int | None = None) -> dict:
    import shutil
    import tempfile

    from clickhouse_etl_loadtest_spark.config.reference_pipeline import reference_pipeline
    from clickhouse_etl_loadtest_spark.harness.executor import TestExecutor

    if n_proc is None:
        n_proc = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = tempfile.mkdtemp(prefix="bench-loadtest-")
    try:
        ex = TestExecutor(spark, "bench", reference_pipeline(), work, f"{work}/results.csv")
        r = ex.run_tests([{"total_records": total_records, "num_processes": n_proc}], resume=False)[0]
        d = r.model_dump()
        out = {
            k: d[k]
            for k in (
                "result_num_records",
                "result_total_generated",
                "result_kafka_ingestion_rps",
                "result_glassflow_rps",
                "result_avg_latency_ms",
                "result_lag_ms",
                "result_success",
                "duration_sec",
            )
        }
        print(f"# loadtest 5M: {out}", file=sys.stderr)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_streaming_loadtest(
    spark,
    total_records: int = 1_000_000,
    state_metrics: bool = False,
    rocksdb_overrides: dict | None = None,
) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clickhouse_etl_loadtest_spark.config.reference_pipeline import reference_pipeline
    from clickhouse_etl_loadtest_spark.sources.generator import generate_user_events, unique_count
    from clickhouse_etl_loadtest_spark.streaming.query import run_streaming_pipeline, stop_pipeline

    rocksdb_conf = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # blind puts: maintaining numRowsTotal costs a RocksDB get() before
        # EVERY put — on the 20M wave that was ~0.9 s of pure read-before-
        # write (allUpdatesTimeMs 482 s -> 431 s summed). The key count is
        # recovered from the sink instead (every unique key is exactly one
        # sink row), so the metric survives without the per-put tax.
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows": "false",
        # changelog compression trades CPU for bytes the wrong way on a
        # local-disk checkpoint (431 s -> 392 s summed update time); on a
        # remote object-store checkpoint, revisit.
        "spark.sql.streaming.stateStore.rocksdb.compression": "no_compression",
        # one memtable holds the whole wave's per-store state (18.18M keys /
        # 32 stores x ~60 B ~= 34 MB < 256 MB), so no mid-batch flush or L0
        # compaction: summed allUpdatesTimeMs 615 s -> 515 s on the 20M
        # wave. The residual ~16 s/thread is the per-row JNI get+put +
        # UnsafeRow codec — the state update floor for this engine, which
        # puts the wave at 22-30 s wall depending on host I/O (the
        # cold/steady split in the output captures the spread).
        "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "256",
        "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "4",
    }
    # bisect hook (see SCALING.md's 20M-wave conf table): lets a probe run
    # the same wave under e.g. round-3 RocksDB settings without editing this
    # file; None value = remove the key entirely (fall back to Spark default)
    for k, v in (rocksdb_overrides or {}).items():
        if v is None:
            rocksdb_conf.pop(k, None)
        else:
            rocksdb_conf[k] = v
    saved = {k: spark.conf.get(k, None) for k in rocksdb_conf}
    if state_metrics:
        # RocksDB state store (W4) for the max-scale wave: the reference's
        # 8h x 18M-key dedup window doesn't fit an in-memory store at scale.
        # Changelog checkpointing commits the per-batch delta instead of
        # snapshotting the whole store (snapshots move to background
        # maintenance) — measured 347 s -> 3 s of summed commit time on the
        # 20M wave. Runtime-settable SQL confs; restored in the finally
        # below so only THIS wave uses RocksDB and other waves stay
        # comparable round-over-round regardless of call order.
        for k, v in rocksdb_conf.items():
            spark.conf.set(k, v)

    p = reference_pipeline()
    topic = p.source.topics[0].name
    work = tempfile.mkdtemp(prefix="bench-stream-")
    label = f"{total_records // 1_000_000}M"
    try:
        ev = generate_user_events(spark, total_records, 0.1, num_partitions=32)
        ev.withColumn(
            "timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp")
        ).write.mode("overwrite").parquet(f"{work}/staging")

        stream = spark.readStream.schema(
            spark.read.parquet(f"{work}/staging").schema
        ).parquet(f"{work}/staging")
        t0 = time.perf_counter()
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
                raise TimeoutError(f"{label} streaming wave did not drain in 1800s")
            # lastProgress is the empty final drain batch — report the state
            # metrics of the batch that actually carried the records
            progress = max(
                query.recentProgress or [query.lastProgress],
                key=lambda pr: pr.get("numInputRows") or 0,
            )
        finally:
            stop_pipeline(p.pipeline_id)
        dt = time.perf_counter() - t0
        got = spark.read.parquet(f"{work}/sink").count()
        out = {
            "result_num_records": total_records,
            "result_glassflow_rps": int(total_records / dt),
            "result_success": got == unique_count(total_records, 0.1),
            "duration_sec": round(dt, 1),
        }
        if state_metrics and progress and progress.get("stateOperators"):
            so = progress["stateOperators"][0]
            cm = so.get("customMetrics") or {}
            n_keys = so.get("numRowsTotal")
            if n_keys is None or n_keys <= 0:
                # trackTotalNumberOfRows=false reports 0/-1; the dedup state
                # holds exactly one key per emitted sink row
                n_keys = got
            out["state_store"] = {
                "provider": "RocksDB (changelog checkpointing, blind puts)",
                "num_keys": n_keys,
                "memory_used_bytes": so.get("memoryUsedBytes"),
                # 0 until background maintenance flushes memtables: changelog
                # checkpointing no longer forces an SST flush per commit
                "rocksdb_total_sst_bytes": cm.get("rocksdbSstFileSize"),
                "commit_time_ms_sum": so.get("commitTimeMs"),
                "update_time_ms_sum": so.get("allUpdatesTimeMs"),
            }
            if os.environ.get("SPARK_GRAFT_STATE_METRICS_FULL") == "1":
                # probe mode (scripts/probe_stream20m.py): every RocksDB
                # custom metric Spark exposes — memtable/compaction/stall
                # counters — too bulky for the committed profile, decisive
                # for regression triage
                out["state_store"]["custom_metrics"] = {
                    k: v for k, v in sorted(cm.items()) if v
                }
        print(f"# streaming loadtest {label}: {out}", file=sys.stderr)
        return out
    finally:
        if state_metrics:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
