"""Temporal two-source join tests (J1, SURVEY.md §2.4 / §7.4).

The reference declares the join but never exercises it (`"join": {"enabled":
false}` in config; only `join.sources[0].join_key` is read for sink ORDER BY,
/root/reference/src/pre_process.py:9-12). GlassFlow docs describe a
left-oriented temporal join of two topics within a time window — tested here
in both forms: batch (equi join + time-range predicate) and streaming
(watermarked stream-stream interval join with bounded state).
"""

import json
import os

import pytest

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.plans.compiler import compile_batch
from clickhouse_etl_loadtest_spark.streaming.query import run_until_drained, stop_pipeline

JOIN_SPEC = {
    "pipeline_id": "join-test",
    "source": {
        "type": "files",
        "topics": [
            {
                "name": "orders_topic",
                "schema": {
                    "fields": [
                        {"name": "order_id", "type": "string"},
                        {"name": "user_id", "type": "string"},
                        {"name": "amount", "type": "string"},
                    ]
                },
                "deduplication": {"enabled": False},
            },
            {
                "name": "users_topic",
                "schema": {
                    "fields": [
                        {"name": "user_id", "type": "string"},
                        {"name": "user_name", "type": "string"},
                    ]
                },
                "deduplication": {"enabled": False},
            },
        ],
    },
    "join": {
        "enabled": True,
        "type": "temporal",
        "sources": [
            {"source_id": "orders_topic", "join_key": "user_id", "time_window": "1h", "orientation": "left"},
            {"source_id": "users_topic", "join_key": "user_id", "time_window": "1h"},
        ],
    },
    "sink": {
        "type": "parquet",
        "table": "joined",
        "max_batch_size": 1000,
        "max_delay_time": "1s",
        "table_mapping": [
            {"source_id": "orders_topic", "field_name": "order_id", "column_name": "order_id", "column_type": "string"},
            {"source_id": "orders_topic", "field_name": "user_id", "column_name": "user_id", "column_type": "string"},
            {"source_id": "orders_topic", "field_name": "amount", "column_name": "amount", "column_type": "string"},
            {"source_id": "users_topic", "field_name": "user_name", "column_name": "user_name", "column_type": "string"},
        ],
    },
}

T0 = "2024-01-01T12:00:00.000Z"
IN_WINDOW = "2024-01-01T12:30:00.000Z"  # 30 min after user event
OUT_WINDOW = "2024-01-01T14:00:00.000Z"  # 2 h after user event


def _order(i, user, ts, amount="10"):
    return {"order_id": f"o{i}", "user_id": user, "amount": amount, "timestamp": ts}


def _user(user, name, ts):
    return {"user_id": user, "user_name": name, "timestamp": ts}


def _write(dirpath, fname, records):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _frames(spark):
    """The same records as in-memory batch DataFrames (ts typed timestamp)."""
    from pyspark.sql import functions as F

    orders = spark.createDataFrame(
        [("o1", "u1", "10", IN_WINDOW), ("o2", "u1", "20", OUT_WINDOW), ("o3", "u2", "30", IN_WINDOW), ("o4", "u9", "40", IN_WINDOW)],
        "order_id string, user_id string, amount string, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    users = spark.createDataFrame(
        [("u1", "Alice", T0), ("u2", "Bob", T0)],
        "user_id string, user_name string, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    return orders, users


def test_batch_temporal_join(spark):
    """Left orientation: in-window orders enriched; out-of-window and
    unmatched-key orders survive with NULL right side."""
    pipeline = PipelineConfig.model_validate(JOIN_SPEC)
    orders, users = _frames(spark)
    out = compile_batch(pipeline, {"orders_topic": orders, "users_topic": users})
    rows = {r["order_id"]: r for r in out.collect()}
    assert set(rows) == {"o1", "o2", "o3", "o4"}
    assert rows["o1"]["user_name"] == "Alice"  # 30 min gap: joined
    assert rows["o2"]["user_name"] is None  # 2 h gap: outside 1h window
    assert rows["o3"]["user_name"] == "Bob"
    assert rows["o4"]["user_name"] is None  # no matching user at all
    assert out.columns == ["order_id", "user_id", "amount", "user_name"]


def test_streaming_temporal_join(spark, tmp_path):
    """Watermarked stream-stream interval join, left orientation. Matched
    rows emit immediately; NULL-extended unmatched rows emit only after the
    watermark closes their window, which a single AvailableNow wave cannot
    reach — so this wave's sink holds exactly the in-window matches."""
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    pipeline = PipelineConfig.model_validate(JOIN_SPEC)
    _write(
        f"{src}/orders_topic",
        "b1.json",
        [_order(1, "u1", IN_WINDOW), _order(2, "u1", OUT_WINDOW), _order(3, "u2", IN_WINDOW), _order(4, "u9", IN_WINDOW)],
    )
    _write(f"{src}/users_topic", "b1.json", [_user("u1", "Alice", T0), _user("u2", "Bob", T0)])
    try:
        run_until_drained(spark, pipeline, sink, ckpt, files_path=src)
    finally:
        stop_pipeline("join-test")
    out = spark.read.parquet(sink)
    rows = {r["order_id"]: r for r in out.collect()}
    assert set(rows) == {"o1", "o3"}  # inner: only in-window matches emit
    assert rows["o1"]["user_name"] == "Alice"
    assert rows["o3"]["user_name"] == "Bob"


def test_join_key_drives_sink_order_by():
    """ORDER BY = join key when join enabled (S8 parity,
    /root/reference/src/utils/clickhouse.py:34-36)."""
    from clickhouse_etl_loadtest_spark.sources.clickhouse import order_by_key

    pipeline = PipelineConfig.model_validate(JOIN_SPEC)
    assert order_by_key(pipeline.sink, pipeline.join) == "user_id"


# --- asof join kind (extension) ------------------------------------------------------

ASOF_SPEC = {**JOIN_SPEC, "join": {**JOIN_SPEC["join"], "type": "asof"}}
T1 = "2024-01-01T12:15:00.000Z"  # second u1 user record, still before o1


def test_batch_asof_join_takes_latest_prior_only(spark):
    """Two in-window right rows for u1: the interval join would fan o1 out to
    two rows; asof takes only the LATEST prior one. Out-of-tolerance and
    unmatched lefts survive with NULL right side (left orientation)."""
    from pyspark.sql import functions as F

    pipeline = PipelineConfig.model_validate(ASOF_SPEC)
    orders, users = _frames(spark)
    users2 = users.unionByName(
        spark.createDataFrame([("u1", "Alice2", T1)], "user_id string, user_name string, timestamp string")
        .withColumn("timestamp", F.to_timestamp("timestamp"))
    )
    out = compile_batch(pipeline, {"orders_topic": orders, "users_topic": users2})
    rows = {r["order_id"]: r for r in out.collect()}
    assert set(rows) == {"o1", "o2", "o3", "o4"}  # no fan-out: one row per left
    assert rows["o1"]["user_name"] == "Alice2"  # latest prior (12:15), not 12:00
    assert rows["o2"]["user_name"] is None  # 1h45m gap: outside tolerance
    assert rows["o3"]["user_name"] == "Bob"
    assert rows["o4"]["user_name"] is None  # no right rows for u9
    assert out.columns == ["order_id", "user_id", "amount", "user_name"]


def test_streaming_asof_join_matches_batch(spark, tmp_path):
    """The streaming compile of the SAME asof pipeline emits, for every left
    row the watermark has finalized, exactly the batch result."""
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    pipeline = PipelineConfig.model_validate(ASOF_SPEC)
    _write(
        f"{src}/orders_topic",
        "b1.json",
        [_order(1, "u1", IN_WINDOW), _order(2, "u1", OUT_WINDOW), _order(3, "u2", IN_WINDOW), _order(4, "u9", IN_WINDOW)],
    )
    _write(
        f"{src}/users_topic",
        "b1.json",
        [_user("u1", "Alice", T0), _user("u1", "Alice2", T1), _user("u2", "Bob", T0)],
    )
    try:
        run_until_drained(spark, pipeline, sink, ckpt, files_path=src)
    finally:
        stop_pipeline("join-test")
    rows = {r["order_id"]: r for r in spark.read.parquet(sink).collect()}
    # max event 14:00, watermark delay 1h -> watermark 13:00: o1/o3/o4
    # (12:30) finalize, o2 (14:00) stays buffered
    assert set(rows) == {"o1", "o3", "o4"}
    assert rows["o1"]["user_name"] == "Alice2"
    assert rows["o3"]["user_name"] == "Bob"
    assert rows["o4"]["user_name"] is None


def test_unknown_join_type_and_orientation_are_rejected(spark):
    """A typo'd join.type (or an orientation asof can't honor) must refuse to
    compile, not silently fall back to the other join's semantics."""
    orders, users = _frames(spark)
    bad_type = PipelineConfig.model_validate({**JOIN_SPEC, "join": {**JOIN_SPEC["join"], "type": "ASOF"}})
    with pytest.raises(ValueError, match="unknown join.type"):
        compile_batch(bad_type, {"orders_topic": orders, "users_topic": users})
    inner_asof = PipelineConfig.model_validate(
        {
            **JOIN_SPEC,
            "join": {
                **JOIN_SPEC["join"],
                "type": "asof",
                "sources": [
                    {**JOIN_SPEC["join"]["sources"][0], "orientation": "inner"},
                    JOIN_SPEC["join"]["sources"][1],
                ],
            },
        }
    )
    with pytest.raises(ValueError, match="left-oriented"):
        compile_batch(inner_asof, {"orders_topic": orders, "users_topic": users})
