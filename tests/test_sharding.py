"""Deterministic shard export (operators/sharding.py): membership, balance,
pseudo-shuffle order, rerun determinism."""

import pyspark.sql.functions as F
import pytest

from clickhouse_etl_loadtest_spark.operators.sharding import (
    export_shards,
    read_shard,
    shard_assignment,
)

N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")


def test_export_roundtrip_membership_and_balance(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "corpus")
    export_shards(docs, path, N_SHARDS)
    back = spark.read.parquet(path)
    # membership: exact doc set preserved, every shard nonempty
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
    sizes = {r.shard: r.n for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(N_SHARDS))
    # hash balance: no shard more than 2x the mean (uniform hash, 500 docs / 4 shards)
    mean = sum(sizes.values()) / N_SHARDS
    assert max(sizes.values()) <= 2 * mean


def test_shard_order_is_pseudo_shuffle_and_deterministic(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "corpus")
    export_shards(docs, path, N_SHARDS)
    order1 = [r.doc_id for r in read_shard(spark, path, 0).select("doc_id").collect()]
    # rerun the whole export: byte-identical order
    path2 = str(tmp_path_factory.mktemp("shards") / "corpus2")
    export_shards(docs, path2, N_SHARDS)
    order2 = [r.doc_id for r in read_shard(spark, path2, 0).select("doc_id").collect()]
    assert order1 == order2
    # the order is a real shuffle, not ingest order
    assert order1 != sorted(order1)
    # and matches the assignment recomputed independently
    expected = [
        r.doc_id
        for r in shard_assignment(docs, N_SHARDS)
        .where(F.col("shard") == 0)
        .orderBy("order_key")
        .select("doc_id")
        .collect()
    ]
    assert order1 == expected


def test_assignment_is_stable_under_corpus_growth(spark, docs):
    # docs present in a smaller corpus keep their shard when the corpus grows
    half = docs.where(F.col("doc_id") % 2 == 0)
    a_half = {r.doc_id: r.shard for r in shard_assignment(half, N_SHARDS).collect()}
    a_full = {r.doc_id: r.shard for r in shard_assignment(docs, N_SHARDS).collect()}
    assert all(a_full[d] == s for d, s in a_half.items())


def test_files_per_shard_splits_output(spark, docs, tmp_path_factory):
    import glob

    path = str(tmp_path_factory.mktemp("shards") / "corpus")
    export_shards(docs, path, N_SHARDS, files_per_shard=2)
    # range partitioning on (shard, order_key) keeps order reconstructible
    order = [r.doc_id for r in read_shard(spark, path, 1).select("doc_id").collect()]
    expected = [
        r.doc_id
        for r in shard_assignment(docs, N_SHARDS)
        .where(F.col("shard") == 1)
        .orderBy("order_key")
        .select("doc_id")
        .collect()
    ]
    assert order == expected
    assert glob.glob(f"{path}/shard=1/*.parquet")


def test_null_ids_are_rejected(spark):
    from pyspark.sql.utils import PythonException

    bad = spark.createDataFrame([(1,), (None,)], "doc_id bigint")
    with pytest.raises(Exception, match="null doc_id|USER_RAISED_EXCEPTION|RaiseError"):
        shard_assignment(bad, N_SHARDS).collect()
