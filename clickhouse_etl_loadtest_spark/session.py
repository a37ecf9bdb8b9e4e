"""SparkSession factory tuned for this engine.

Defaults target local[$SPARK_GRAFT_CPUS] test runs but every knob is chosen
to survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalescing, skew-join splitting) so one static
  ``shuffle.partitions`` value doesn't have to be right at every scale.
- Arrow on for the few Pandas-UDF operators (multimodal decode, heavy text).
- RocksDB state store for streaming dedup: the reference's 8h x 18M-key dedup
  window (see /root/reference/results/19_05_001_results.csv) does not fit in
  an HDFS-backed in-memory state store at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "clickhouse-etl-loadtest-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    streaming: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32);
    on a real cluster pass ``None`` and let spark-submit supply it.
    """
    if master is None:
        from pyspark import SparkConf

        if SparkConf().contains("spark.master"):
            # spark-submit --master (or spark-defaults) already decided;
            # overriding it with local[] would silently pull a cluster job
            # back onto the driver machine
            master = ""
        else:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 128 MiB input splits: big enough to amortize task overhead at 100 TB,
        # small enough that a single parquet row-group skew doesn't stall a stage.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # NOTE (r14): no spark.sql.files.minPartitionNum override — its
        # default already falls back to the session's default parallelism
        # (probed: the sf1.0 184 MB lineitem scans 32-wide out of the box),
        # so an explicit floor at the core count is a no-op at every core
        # count the driver uses.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if streaming:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        ).config(
            # commit the per-batch changelog instead of snapshotting the whole
            # store every trigger (snapshots move to background maintenance):
            # measured 347 s -> 3 s summed commit time at 18.2M keys (bench.py
            # 20M wave). At 1000 executors the difference is uploading deltas
            # vs the full state per trigger.
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register the fixture parquet tables as temp views and return them.

    Delegates to :mod:`.sources.tables` so every caller gets the same schema
    normalization (the ``events.ts`` nano-timestamp handling) — do not read
    the fixture parquet directly.
    """
    from .sources.tables import TABLES, load_tables as _load

    return _load(spark, sf_dir, names or TABLES)
