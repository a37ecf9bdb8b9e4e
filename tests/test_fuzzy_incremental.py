"""Incremental fuzzy dedup against the persistent band index
(operators/fuzzydedup.py) — the streaming-ingest twin of the batch
MinHash-LSH dedup queries, driven as two foreachBatch-shaped waves."""

from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.fuzzydedup import admit_batch, minhash_band_table


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_band_table_matches_registered_lsh_pairs(spark, sf_dir):
    """Index entries collide exactly where doc_minhash_lsh_pairs reports
    pairs: joining the band table to itself reproduces the registered
    query's candidate pair set (same constants, same hashing)."""
    from clickhouse_etl_loadtest_spark.queries import load_all

    d = _docs(spark, sf_dir)
    bands = minhash_band_table(d).alias("x")
    other = minhash_band_table(d).alias("y")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in bands.join(
            other,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
        .distinct()
        .collect()
    }
    registered = {
        (r["doc_a"], r["doc_b"])
        for r in load_all()["doc_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    assert pairs == registered


def test_incremental_admission_across_waves(spark, sf_dir, tmp_path):
    index = f"{tmp_path}/band-index"
    d = _docs(spark, sf_dir)

    wave1 = d.where(F.col("doc_id") < 300).select("doc_id", "text")
    admitted1 = admit_batch(spark, wave1, index)
    n1 = admitted1.count()
    assert 0 < n1 <= 300  # fixture contains intra-corpus near-dups

    # wave 2: one verbatim copy of an accepted doc (must drop), one novel doc
    # (must keep), and an intra-batch duplicate pair (first id wins)
    copied_text = d.where(F.col("doc_id") == 5).select("text").first()[0]
    novel = "zzqq wwvv xxyy " + " ".join(f"uniqtok{i} fresh{i}" for i in range(40))
    wave2 = spark.createDataFrame(
        [
            (9001, copied_text),  # cross-wave near-dup (exact copy)
            (9002, novel),  # genuinely new
            (9004, novel),  # intra-batch dup of 9002
        ],
        "doc_id long, text string",
    )
    admitted2 = {r["doc_id"] for r in admit_batch(spark, wave2, index).collect()}
    assert admitted2 == {9002}

    # the index grew by the admitted doc's bands only: re-sending the novel
    # doc under a new id is now a cross-wave duplicate
    wave3 = spark.createDataFrame([(9100, novel)], "doc_id long, text string")
    assert admit_batch(spark, wave3, index).count() == 0


def test_fuzzy_admission_as_streaming_foreachbatch(spark, sf_dir, tmp_path):
    """The operator running as an actual Structured Streaming foreachBatch
    body: wave 1 seeds the index through a streaming query; a second
    checkpointed streaming run over new files admits only the novel doc."""
    index = f"{tmp_path}/band-index"
    sink = f"{tmp_path}/admitted"
    src = f"{tmp_path}/incoming"
    ckpt = f"{tmp_path}/ckpt"
    d = _docs(spark, sf_dir)

    def admit_writer(batch_df, batch_id):
        admitted = admit_batch(spark, batch_df, index, batch_id=batch_id)
        admitted.write.mode("append").parquet(sink)

    def drain_wave():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = (
            stream.writeStream.foreachBatch(admit_writer)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    wave1 = d.where(F.col("doc_id") < 200).select("doc_id", "text")
    wave1.coalesce(1).write.mode("append").parquet(src)
    drain_wave()
    n1 = spark.read.parquet(sink).count()
    assert 0 < n1 <= 200

    copied_text = d.where(F.col("doc_id") == 7).select("text").first()[0]
    novel = "qqzz streaming wave token " + " ".join(f"swtok{i}" for i in range(50))
    spark.createDataFrame(
        [(9500, copied_text), (9501, novel)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    drain_wave()  # checkpoint resumes: only the new file is a fresh batch

    admitted = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert 9501 in admitted and 9500 not in admitted
    assert len(admitted) == n1 + 1


def test_admit_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Checkpoint-recovery replay of the SAME micro-batch (same batch_id)
    must admit the same rows: the batch's own just-appended bands are
    excluded from the collision read and its partition is overwritten, so
    a replayed batch never collides with itself (the pre-fix failure mode
    silently dropped every row of the replay)."""
    index = f"{tmp_path}/band-index"
    d = _docs(spark, sf_dir)
    wave = d.where(F.col("doc_id") < 120).select("doc_id", "text")

    first = {r["doc_id"] for r in admit_batch(spark, wave, index, batch_id=0).collect()}
    assert first
    replay = {r["doc_id"] for r in admit_batch(spark, wave, index, batch_id=0).collect()}
    assert replay == first

    # and the index holds ONE copy of the batch's bands (overwrite, not append)
    idx = spark.read.parquet(index)
    assert idx.count() == idx.distinct().count()

    # a LATER batch still dedups against batch 0 normally
    assert admit_batch(spark, wave, index, batch_id=1).count() == 0


def test_intra_batch_resolution_is_cluster_transitive(spark, sf_dir, tmp_path):
    """Intra-batch collisions resolve as duplicate CLUSTERS (doc_dup_clusters
    semantics): the admitted set must be exactly one representative — the
    minimum id — per connected component of the bucket-overlap graph, plus
    every non-colliding doc. Pins transitivity: when B collides with keeper
    A in one bucket and C collides with B in another, {A,B,C} is ONE
    cluster and A alone survives (bucket-local first-wins would drop C
    without any surviving representative of its neighborhood)."""
    from clickhouse_etl_loadtest_spark.operators.graph import connected_components

    index = f"{tmp_path}/band-index"
    d = _docs(spark, sf_dir)
    wave = d.where(F.col("doc_id") < 300).select("doc_id", "text")

    admitted = {r["doc_id"] for r in admit_batch(spark, wave, index, batch_id=0).collect()}

    bands = minhash_band_table(wave).alias("x")
    other = minhash_band_table(wave).alias("y")
    edges = (
        bands.join(
            other,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    comp = connected_components(edges, "a", "b")
    cluster_reps = {r["label"] for r in comp.select("label").distinct().collect()}
    clustered = {r["id"] for r in comp.select("id").collect()}
    all_ids = {r["doc_id"] for r in wave.select("doc_id").collect()}
    expected = cluster_reps | (all_ids - clustered)
    assert admitted == expected
    assert len(clustered) > len(cluster_reps)  # fixture really has clusters


def test_band_index_compaction_preserves_admissions(spark, sf_dir, tmp_path):
    """compact_band_index folds band partitions (pure concatenation —
    admitted docs share no band with the index, so rows are globally
    distinct) and later waves admit IDENTICALLY to an uncompacted twin;
    replays at/below the floor fail loud, forward re-compaction works."""
    import pytest as _pytest

    from clickhouse_etl_loadtest_spark.operators.fuzzydedup import (
        compact_band_index,
    )

    d = _docs(spark, sf_dir)
    waves = [
        d.where(F.col("doc_id") % 3 == k).select("doc_id", "text") for k in range(3)
    ]

    def drive(tag, compact_after=None):
        index = f"{tmp_path}/idx_{tag}"
        admitted = []
        for bid, w in enumerate(waves):
            admitted.append(
                sorted(r["doc_id"] for r in admit_batch(
                    spark, w, index, batch_id=bid
                ).collect())
            )
            if compact_after is not None and bid == compact_after:
                info = compact_band_index(spark, index, upto_batch_id=bid)
                assert info["floor"] == bid and info["merged_partitions"] == bid + 1
        return index, admitted

    plain_idx, plain = drive("plain")
    folded_idx, folded = drive("folded", compact_after=1)
    assert folded == plain
    want = sorted(
        (r["band"], r["sig"]) for r in spark.read.parquet(plain_idx).collect()
    )
    got = sorted(
        (r["band"], r["sig"]) for r in spark.read.parquet(folded_idx).collect()
    )
    assert got == want

    # replay at/below the floor fails loud; above it replays still work
    with _pytest.raises(ValueError, match="compaction floor"):
        admit_batch(spark, waves[1], folded_idx, batch_id=1)
    replay = sorted(
        r["doc_id"]
        for r in admit_batch(spark, waves[2], folded_idx, batch_id=2).collect()
    )
    assert replay == folded[2]
    # backward re-compaction fails loud; forward works
    with _pytest.raises(ValueError, match="step backwards"):
        compact_band_index(spark, folded_idx, upto_batch_id=0)
    info2 = compact_band_index(spark, folded_idx, upto_batch_id=2)
    assert info2["floor"] == 2
    assert sorted(
        (r["band"], r["sig"]) for r in spark.read.parquet(folded_idx).collect()
    ) == want
