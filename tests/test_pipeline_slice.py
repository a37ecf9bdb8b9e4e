"""End-to-end slice tests: generator -> dedup -> mapping (SURVEY.md §7.1).

Verifies the reference's own correctness invariant — sink row count equals
the number of unique generated records (/root/reference/src/pipeline_test.py:13-45)
— plus row-level content the reference never checked (SURVEY.md §5).
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_etl_loadtest_spark.config.schemas import PipelineConfig
from clickhouse_etl_loadtest_spark.operators.dedup import dedup_first_wins
from clickhouse_etl_loadtest_spark.plans.compiler import compile_batch
from clickhouse_etl_loadtest_spark.sources.generator import (
    generate_user_events,
    generator_oracle_sql,
    unique_count,
)

from clickhouse_etl_loadtest_spark.config.reference_pipeline import (
    REFERENCE_PIPELINE_SPEC as PIPELINE_SPEC,
)


def test_unique_count_matches_reference_results():
    # 5,000,000 records @ 0.1 -> 4,545,454 uniques (results/19_05_001_results.csv:2)
    assert unique_count(5_000_000, 0.1) == 4_545_454
    assert unique_count(20_000_000, 0.1) == 18_181_818


def test_generator_cardinality_and_shape(spark):
    total, rate = 1100, 0.1
    df = generate_user_events(spark, total, rate).cache()
    n_unique = unique_count(total, rate)
    assert df.count() == total
    assert df.select("event_id").distinct().count() == n_unique
    assert df.filter("is_duplicate").count() == total - n_unique
    row = df.filter("seq = 0").first()
    assert len(row["event_id"]) == 36 and row["event_id"].count("-") == 4
    assert "@" in row["email"]
    df.unpersist()


def test_generator_matches_duckdb_oracle(spark):
    total = 500
    got = {
        tuple(r)
        for r in generate_user_events(spark, total, 0.1)
        .toPandas()
        .itertuples(index=False)
    }
    want = {tuple(r) for r in duckdb.sql(generator_oracle_sql(total, 0.1)).fetchall()}
    assert got == want


def test_duplicates_follow_originals(spark):
    df = generate_user_events(spark, 550, 0.1)
    firsts = df.groupBy("event_id").agg({"seq": "min"}).withColumnRenamed("min(seq)", "first_seq")
    joined = df.join(firsts, "event_id")
    late_originals = joined.filter("is_duplicate = false AND seq > first_seq").count()
    assert late_originals == 0


def test_pipeline_end_to_end_invariant(spark):
    pipeline = PipelineConfig.model_validate(PIPELINE_SPEC)
    total, rate = 2200, 0.1
    events = generate_user_events(spark, total, rate)
    out = compile_batch(pipeline, {"user_events_with_duplicates": events}).cache()

    # the reference's invariant: sink rows == unique records
    assert out.count() == unique_count(total, rate)
    # mapping parity: names, order, types (FIXTURES.md A2)
    assert out.columns == ["event_id", "user_id", "created_at", "user_name", "user_email"]
    assert dict(out.dtypes)["created_at"] == "timestamp"
    out.unpersist()


def test_pipeline_from_reference_shaped_json(tmp_path):
    import json

    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(PIPELINE_SPEC))
    cfg = PipelineConfig.from_json_file(str(p))
    assert cfg.sink.order_by_key(cfg.join) == "event_id"
    assert cfg.source.topics[0].deduplication.time_window == "8h"


@settings(max_examples=8, deadline=None)
@given(
    total=st.integers(min_value=1, max_value=2000),
    rate=st.sampled_from([0.0, 0.05, 0.1, 0.25, 0.5, 1.0]),
)
def test_dedup_invariant_property(total, rate):
    """Property (SURVEY.md §5 item 5): for ANY (total, duplication_rate),
    first-wins dedup of the generator output yields exactly unique_count rows,
    every key once, and every kept row is an original (is_duplicate=False)."""
    spark = _property_spark()
    ev = generate_user_events(spark, total, rate)
    out = dedup_first_wins(ev, "event_id", order_col="seq")
    n_unique = unique_count(total, rate)
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique
    assert out.where("is_duplicate").count() == 0


def _property_spark():
    from clickhouse_etl_loadtest_spark.session import get_spark

    return get_spark()


def test_sink_files_clustered_by_order_key(spark, tmp_path):
    """write_sink_batch sorts within partitions on the sink ORDER BY key —
    MergeTree-layout parity: every sink file is internally ordered so parquet
    row-group stats support key-range skipping."""
    from clickhouse_etl_loadtest_spark.plans.compiler import write_sink_batch

    pipeline = PipelineConfig.model_validate(PIPELINE_SPEC)
    ev = generate_user_events(spark, 2_000, 0.1, num_partitions=4)
    out = compile_batch(pipeline, {pipeline.source.topics[0].name: ev})
    sink = str(tmp_path / "sink")
    write_sink_batch(out, pipeline, sink)

    import glob as _glob

    import pyarrow.parquet as pq

    key = pipeline.sink.order_by_key(pipeline.join)
    files = _glob.glob(f"{sink}/*.parquet")
    assert files
    checked = 0
    for f in files:
        vals = pq.read_table(f, columns=[key]).column(key).to_pylist()
        if len(vals) > 1:
            assert vals == sorted(vals), f
            checked += 1
    assert checked >= 1
