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
