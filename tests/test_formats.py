"""Multi-format I/O (sources/formats.py): schema-preserving round-trips on
the real fixtures — including the hostile cases (embedded delimiters /
quotes / newlines, NULL-vs-empty-string, timestamps, nested arrays) — and
the analytical-vs-landing plan contrast (pushdown reaches parquet scans,
never CSV)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.sources.formats import (
    LANDING_FORMATS,
    SUPPORTED_FORMATS,
    read_table,
    write_table,
)
from clickhouse_etl_loadtest_spark.sources.tables import load_table


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


@pytest.mark.parametrize("fmt", SUPPORTED_FORMATS)
def test_lineitem_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "lineitem").limit(500)
    path = str(tmp_path / f"li.{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, ["l_orderkey", "l_linenumber"]) == _sorted_rows(
        src, ["l_orderkey", "l_linenumber"]
    )


@pytest.mark.parametrize("fmt", SUPPORTED_FORMATS)
def test_events_timestamps_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "events").limit(300)
    path = str(tmp_path / f"ev.{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, ["event_id"]) == _sorted_rows(src, ["event_id"])


@pytest.mark.parametrize("fmt", SUPPORTED_FORMATS)
def test_hostile_text_roundtrip(spark, tmp_path, fmt):
    """Embedded commas, quotes, newlines, the CSV null sentinel itself as
    data, NULLs, and empty strings must all survive byte-for-byte."""
    rows = [
        (1, 'comma, "quote", done'),
        (2, "line\nbreak\r\nand more"),
        (3, None),
        (4, ""),
        (5, "\\N"),  # the sentinel as LITERAL data
        (6, "trailing space  "),
    ]
    src = spark.createDataFrame(rows, "id long, text string")
    path = str(tmp_path / f"hostile.{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    got = {r["id"]: r["text"] for r in back.collect()}
    want = dict(rows)
    if fmt == "csv":
        # the documented CSV lossiness: the sentinel collapses literal "\\N"
        # data to NULL — everything else must round-trip exactly
        want[5] = None
    assert got == want, fmt


def test_embeddings_arrays_roundtrip_json_but_not_csv(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "embeddings").limit(50)
    path = str(tmp_path / "emb.json")
    write_table(src, path, "json")
    back = read_table(spark, path, "json", schema=src.schema)
    assert _sorted_rows(back, ["vec_id"]) == _sorted_rows(src, ["vec_id"])
    with pytest.raises(ValueError, match="CSV cannot represent nested"):
        write_table(src, str(tmp_path / "emb.csv"), "csv")


def test_landing_reads_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "x"), "json")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), "avro")


def test_pushdown_reaches_parquet_and_orc_but_not_csv(spark, sf_dir, tmp_path):
    """The analytical-vs-landing contrast this module documents: the same
    filter is pushed into parquet/ORC scans and absent from the CSV scan."""
    src = load_table(spark, sf_dir, "lineitem").limit(2000)
    plans = {}
    for fmt in ("parquet", "orc", "csv"):
        path = str(tmp_path / f"pd.{fmt}")
        write_table(src, path, fmt)
        df = read_table(spark, path, fmt, schema=src.schema).where(F.col("l_quantity") > 30.0)
        plans[fmt] = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plans["parquet"]
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plans["orc"]
    # columnar formats scan vectorized (row-group statistics can skip IO);
    # CSV accepts parser-level pushdown too but must still PARSE EVERY BYTE
    # row-at-a-time — Batched: false is the honest plan-visible contrast
    assert "Batched: true" in plans["parquet"].split("FileScan")[1]
    assert "Batched: true" in plans["orc"].split("FileScan")[1]
    assert "Batched: false" in plans["csv"].split("FileScan")[1]


def test_json_landing_stream_compacts_to_parquet(spark, sf_dir, tmp_path):
    """The land -> compact pattern the module docstring prescribes, proven as
    a REAL stream: JSON-lines files arrive continuously (availableNow file
    stream with the declared schema), each micro-batch appends to a
    batch-keyed parquet sink, and the compaction pass produces the
    analytical layout — row- and value-identical to the landed data."""
    from clickhouse_etl_loadtest_spark.streaming.sink import compact_sink

    src = load_table(spark, sf_dir, "events").limit(600).select(
        "event_id", "user_id", "event_type", "value"
    )
    landing = str(tmp_path / "landing")
    # several JSON files so the file stream yields multiple micro-batches
    write_table(src.repartition(3), landing, "json")
    sink = str(tmp_path / "sink")

    def _ingest(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .json(landing)
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(300)

    out = compact_sink(spark, sink, key="event_id", target_rows_per_file=200)
    back = spark.read.parquet(out)
    assert _sorted_rows(back, ["event_id"]) == _sorted_rows(src, ["event_id"])
    # the compacted table is the analytical format: vectorized scan with
    # pushdown — the whole point of not querying the landing zone
    plan = (
        back.where(F.col("event_id") > 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Batched: true" in plan and "PushedFilters: [IsNotNull(event_id)" in plan
