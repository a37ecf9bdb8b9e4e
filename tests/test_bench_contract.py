"""The driver parses bench.py's stdout JSON from a ~2000-char tail — round 4
overflowed it and the official bench recorded parsed:null. Pin the budget
machinery without running Spark: the compact helpers must keep a fully
populated line under budget."""

import json

import bench


def _rep_loadtest():
    return {
        "result_num_records": 20_000_000,
        "result_total_generated": 18_181_818,
        "result_kafka_ingestion_rps": 1_822_290,
        "result_glassflow_rps": 525_978,
        "result_avg_latency_ms": 0.0029584,
        "result_lag_ms": 1213.6,
        "result_success": True,
        "duration_sec": 120.53,
    }


def test_compact_stdout_line_fits_tail_budget():
    q = {f"very_long_headline_query_name_{i}": 12.345 for i in range(8)}
    stream20 = dict(
        _rep_loadtest(),
        duration_sec_norm=57.3,
        cold_run={"duration_sec": 62.2, "result_glassflow_rps": 321_516},
        state_store={
            "provider": "RocksDB (changelog checkpointing, blind puts)",
            "num_keys": 18_181_818,
            "memory_used_bytes": 1_845_576_192,
            "rocksdb_total_sst_bytes": 0,
            "commit_time_ms_sum": 19_789,
            "update_time_ms_sum": 2_243_735,
        },
    )
    out = {
        "metric": "headline_queries_wall_sec",
        "value": 123.456,
        "value_norm": 98.765,
        "unit": "sec",
        "queries": q,
        "queries_norm": q,
        "cold_value": 234.567,
        "sf": 0.1,
        "calib": {"ref_sec": 1.15, "queries_sec": 7.114, "loadtest_sec": 7.114,
                  "stream_sec": 7.114, "end_sec": 7.114},
        "noise_flags": sorted(q),
        "loadtest_5m": bench._compact_loadtest(_rep_loadtest()),
        "loadtest_5m_steady": bench._compact_loadtest(_rep_loadtest()),
        "sweep_glassflow_rps": {str(p): 1_822_290 for p in (2, 4, 8, 16, 32)},
        "streaming_loadtest_1m": bench._compact_loadtest(_rep_loadtest()),
        "streaming_loadtest_20m": bench._compact_stream20m(stream20),
        "detail": "BENCH_PROFILE.json",
    }
    line = json.dumps(out, separators=(",", ":"))
    # the progressive-drop loop in bench.main() guards the overflow case;
    # here we pin that a REALISTIC fully-populated line (8 long query names,
    # worst-case magnitudes) fits without dropping anything
    assert len(line) <= 1800, f"{len(line)} chars — the driver tail truncates at ~2000"


def _delta(wall=1.0, cpu_ms=1000, prev_cpu_ms=1000, run_stdev=0.02, prev_wall=1.0):
    p = {
        "warm_median_sec": prev_wall,
        "warm_median_norm_sec": prev_wall,
        "warm_stdev_sec": 0.02,
        "stage_cpu_ms": prev_cpu_ms,
    }
    return bench.query_delta(wall, wall, run_stdev, 1.0, 1.0, p, cpu_ms)


def test_query_delta_never_both_cpu_regressed_and_noise():
    """Round-10 contradiction: the driver's profile showed a row with
    cpu_regressed: true AND noise: true. The classifier must surface the
    disagreement instead of absorbing the CPU signal."""
    # wall flat (inside every envelope) but stage-CPU +42%
    d = _delta(wall=1.02, cpu_ms=1418, prev_cpu_ms=1000)
    assert d["cpu_regressed"] is True
    assert d["noise"] is False
    assert "disagreement" in d["noise_reason"]
    # the general invariant, a few shapes
    for w, c in ((0.9, 1500), (1.3, 1400), (1.0, 5000)):
        d = bench.query_delta(
            w, w, 0.02, 1.0, 1.0,
            {"warm_median_sec": 1.0, "warm_median_norm_sec": 1.0,
             "warm_stdev_sec": 0.02, "stage_cpu_ms": 1000}, c)
        assert not (d.get("cpu_regressed") and d["noise"])


def test_query_delta_wall_only_regression_is_noise():
    # wall +80% but CPU flat: environment, not the plan
    d = _delta(wall=1.8, cpu_ms=1010, prev_cpu_ms=1000)
    assert d["cpu_regressed"] is False
    assert d["noise"] is True
    assert d["noise_reason"] == "wall regressed but stage-CPU flat"


def test_query_delta_real_regression_flags():
    # both wall and CPU up: a real regression, flagged
    d = _delta(wall=2.0, cpu_ms=2000, prev_cpu_ms=1000)
    assert d["cpu_regressed"] is True and d["noise"] is False


def test_stream20m_delta_keys_on_update_time():
    prev = {
        "duration_sec": 18.8,
        "duration_sec_norm": 13.7,
        "state_store": {"update_time_ms_sum": 441_000},
    }
    # the round-10 shape: wall +77%, update time +26% -> work regressed,
    # never noise (regardless of wall normalization)
    cur = {
        "duration_sec": 33.3,
        "duration_sec_norm": 25.1,
        "state_store": {"update_time_ms_sum": 555_000},
    }
    d = bench.stream20m_delta(cur, prev)
    assert d["work_regressed"] is True and d["noise"] is False
    assert d["update_time_delta_pct"] == 25.9
    # wall up but update time flat -> environment
    cur2 = {
        "duration_sec": 33.3,
        "duration_sec_norm": 25.1,
        "state_store": {"update_time_ms_sum": 450_000},
    }
    d2 = bench.stream20m_delta(cur2, prev)
    assert d2["work_regressed"] is False and d2["noise"] is True
    # no state metrics on the prev side -> falls back to normalized wall
    d3 = bench.stream20m_delta(cur, {"duration_sec": 18.8, "duration_sec_norm": 13.7})
    assert "work_regressed" not in d3 and d3["noise"] is False


def test_compact_stream20m_carries_gate_fields():
    out = bench._compact_stream20m(
        dict(_rep_loadtest(), duration_sec_norm=57.3,
             cold_run={"duration_sec": 62.2},
             state_store={"num_keys": 5, "update_time_ms_sum": 7, "commit_time_ms_sum": 9})
    )
    assert out["duration_sec"] == 120.53
    assert out["duration_sec_norm"] == 57.3
    assert out["cold_duration_sec"] == 62.2
    assert out["update_time_ms_sum"] == 7
    assert bench._compact_stream20m(None) is None


def test_stream20m_delta_near_boundary_demands_probe():
    """Round-13 rule: a work delta within 5pp of the 25% threshold is never
    labeled plainly — whichever side it lands on, the reason points at the
    3-run isolated probe (the r12 +24.8% rise slid under the gate as
    'update time flat')."""
    prev = {
        "duration_sec": 19.7,
        "duration_sec_norm": 15.0,
        "state_store": {"update_time_ms_sum": 412_000},
    }

    def cur(update):
        return {
            "duration_sec": 22.4,
            "duration_sec_norm": 17.0,
            "state_store": {"update_time_ms_sum": update},
        }

    # the r12 shape: +24.8% -> still under the gate, but not "flat"
    d = bench.stream20m_delta(cur(514_000), prev)
    assert d["work_regressed"] is False and d["noise"] is True
    assert "probe before trusting" in d["noise_reason"]
    # just over: regression with the near-threshold nuance
    d = bench.stream20m_delta(cur(527_000), prev)
    assert d["work_regressed"] is True and d["noise"] is False
    assert "probe before trusting" in d["noise_reason"]
    # far under / far over: the plain labels
    d = bench.stream20m_delta(cur(430_000), prev)
    assert d["noise"] is True and "flat" in d["noise_reason"]
    d = bench.stream20m_delta(cur(600_000), prev)
    assert d["noise"] is False and "regressed >25%" in d["noise_reason"]
    # a large improvement is named, not called flat (the r13 -49.5% shape)
    d = bench.stream20m_delta(cur(220_000), prev)
    assert d["noise"] is True and "improved" in d["noise_reason"]
    assert "flat" not in d["noise_reason"]


def test_tail_over_head_drops_warmup_wave():
    """Wave 0 carries JVM/JIT warmup; with >=4 waves it must not inflate the
    head median (which would understate growth); short series keep it."""
    flat_after_warmup = [5.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    assert bench._tail_over_head(flat_after_warmup) == 1.0
    growing = [5.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert bench._tail_over_head(growing) > 2.0
    # too short to spare a wave: all points used
    assert bench._tail_over_head([5.0, 1.0, 2.0]) == 0.4
