"""Streaming incremental packing: streamed == batch manifest, replay
idempotence, cursor exactness — driven both as direct foreachBatch-body
calls and through a REAL availableNow file stream.

The tokenizer regex and context length are canonical in ``textconst.py``
(shared by both layers since round 11), so literal drift is impossible by
construction; the streamed==batch equality still pins the SEMANTICS (same
tokenize, same prefix-sum, same chunking) row-for-row.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.packstream import (
    cursor,
    pack_batch,
    read_manifest,
)
from clickhouse_etl_loadtest_spark.queries import load_all

REG = load_all()

_COLS = [
    "doc_id",
    "len_tokens",
    "start_offset",
    "chunk_first",
    "chunk_last",
    "n_chunks",
    "crosses_boundary",
]


def _canon(df):
    return [tuple(r) for r in df.select(*_COLS).orderBy("doc_id").collect()]


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _waves(docs, n_waves=4):
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    per = (len(ids) + n_waves - 1) // n_waves
    return [ids[i * per : (i + 1) * per] for i in range(n_waves)]


def test_streamed_equals_batch_manifest(spark, sf_dir, docs, tmp_path):
    state = str(tmp_path / "pack_state")
    for bid, wave in enumerate(_waves(docs)):
        pack_batch(spark, docs.where(F.col("doc_id").isin(wave)), state, bid)
    batch = REG["doc_context_packing"].fn(spark, sf_dir)
    assert _canon(read_manifest(spark, state)) == _canon(batch)


def test_replay_is_idempotent_and_cursor_exact(spark, sf_dir, docs, tmp_path):
    state = str(tmp_path / "pack_state")
    waves = _waves(docs)
    for bid, wave in enumerate(waves):
        pack_batch(spark, docs.where(F.col("doc_id").isin(wave)), state, bid)
    before = _canon(read_manifest(spark, state))
    end_before = cursor(spark, state)
    # checkpoint-recovery replay of the LAST wave: same batch_id, same rows
    last_bid = len(waves) - 1
    info = pack_batch(
        spark, docs.where(F.col("doc_id").isin(waves[last_bid])), state, last_bid
    )
    assert _canon(read_manifest(spark, state)) == before
    assert cursor(spark, state) == end_before == info["end"]
    # the cursor equals the exact corpus token mass (tokens + one EOS per doc)
    total = read_manifest(spark, state).agg(F.sum("len_tokens")).first()[0]
    assert end_before == int(total)


def test_real_availablenow_stream(spark, sf_dir, docs, tmp_path):
    """Drive pack_batch as a real foreachBatch body over a file stream and
    require the merged manifest to equal the one-shot batch pack."""
    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "pack_state")
    rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    per = (len(rows) + 2) // 3
    for w in range(3):
        chunk = rows[w * per : (w + 1) * per]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                    "text": pa.array([r["text"] for r in chunk], pa.string()),
                }
            ),
            str(src / f"wave{w}.parquet"),
        )
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: pack_batch(bdf.sparkSession, bdf, state, bid)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    batch = REG["doc_context_packing"].fn(spark, sf_dir)
    assert _canon(read_manifest(spark, state)) == _canon(batch)


def test_empty_state_reads(spark, tmp_path):
    state = str(tmp_path / "nothing")
    assert read_manifest(spark, state).count() == 0
    assert cursor(spark, state) == 0


def test_interleaved_waves_pack_in_arrival_order(spark, tmp_path):
    """When doc_id ranges interleave ACROSS waves, the stream packs in
    (arrival wave, doc_id within wave) order — not global doc_id order.
    The offsets must still tile [0, total) exactly, and each wave's rows
    must sit between its predecessor's end and its own end."""
    rows = [(i, f"tok{i} " * (i % 7 + 1)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "pack_state")
    # wave 0 takes the HIGH ids, wave 1 the low ids, wave 2 the middle
    waves = [range(40, 60), range(0, 20), range(20, 40)]
    ends = []
    for bid, ids in enumerate(waves):
        info = pack_batch(spark, df.where(F.col("doc_id").isin(list(ids))), state, bid)
        ends.append(info["end"])
    m = read_manifest(spark, state).collect()
    assert len(m) == 60
    spans = sorted((r["start_offset"], r["len_tokens"], r["doc_id"]) for r in m)
    acc = 0
    for off, ln, _ in spans:
        assert off == acc
        acc += ln
    assert acc == ends[-1] == cursor(spark, state)  # tiles to the final cursor
    # arrival order: wave 0's docs (ids 40-59) occupy the LOWEST offsets
    by_offset = [d for _, _, d in spans]
    assert by_offset == list(range(40, 60)) + list(range(0, 20)) + list(range(20, 40))


def test_curate_and_pack_streamed_equals_batch(spark, sf_dir, tmp_path):
    """The composed incremental shards→trainer path: archives stream in
    doc_id-ordered waves through WET curation into the packed token stream,
    and the final manifest must equal the batch composition (full-corpus
    verdicts → keep-first kept set → doc_id-order prefix sum). A replay of
    the last wave must change nothing."""
    from clickhouse_etl_loadtest_spark.operators.packstream import (
        curate_and_pack_batch,
    )
    from clickhouse_etl_loadtest_spark.operators.wetstream import (
        _walk_warc,
        wet_verdicts,
    )
    from clickhouse_etl_loadtest_spark.queries.html import _warc_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frame = docs.select("doc_id", _warc_col().alias("warc"))
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    per = (len(ids) + 2) // 3
    wet_store = str(tmp_path / "wet_store")
    pack_state = str(tmp_path / "pack_state")
    infos = []
    for bid in range(3):
        wave_ids = ids[bid * per : (bid + 1) * per]
        infos.append(
            curate_and_pack_batch(
                spark,
                frame.where(F.col("doc_id").isin(wave_ids)),
                wet_store,
                pack_state,
                bid,
            )
        )
    got = sorted(
        (
            (r["doc_id"], r["len_tokens"], r["start_offset"], r["n_chunks"])
            for r in read_manifest(spark, pack_state).collect()
        )
    )

    # batch twin: full-corpus verdicts -> keep-first kept set -> doc_id-order
    # exclusive prefix sum, computed independently in plain Python
    v = wet_verdicts(_walk_warc(frame)).collect()
    first_by_fp: dict[int, int] = {}
    for r in sorted(v, key=lambda r: r["doc_id"]):
        first_by_fp.setdefault(r["fingerprint"], r["doc_id"])
    kept = [
        r
        for r in sorted(v, key=lambda r: r["doc_id"])
        if r["keep_quality"] and first_by_fp[r["fingerprint"]] == r["doc_id"]
    ]
    want, acc = [], 0
    for r in kept:
        ln = r["n_tokens"] + 1
        first = acc // 512
        last = (acc + ln - 1) // 512
        want.append((r["doc_id"], ln, acc, last - first + 1))
        acc += ln
    assert got == sorted(want)
    assert infos[-1]["end"] == acc == cursor(spark, pack_state)

    # post-crash re-delivery of the final wave: everything must be unchanged
    replay = curate_and_pack_batch(
        spark,
        frame.where(F.col("doc_id").isin(ids[2 * per :])),
        wet_store,
        pack_state,
        2,
    )
    assert replay == infos[-1]
    got2 = sorted(
        (
            (r["doc_id"], r["len_tokens"], r["start_offset"], r["n_chunks"])
            for r in read_manifest(spark, pack_state).collect()
        )
    )
    assert got2 == got


def test_recrawl_in_wave_does_not_unblock_fingerprint(spark, sf_dir, tmp_path):
    """A doc re-crawled in the CURRENT wave must not make its fingerprint
    look novel: novelty derives from raw sightings, not latest-wins
    verdicts. Otherwise a new smaller-doc_id doc carrying the same
    fingerprint would re-pack content the token stream already holds."""
    from clickhouse_etl_loadtest_spark.operators.packstream import (
        curate_and_pack_batch,
    )
    from clickhouse_etl_loadtest_spark.operators.wetstream import (
        _walk_warc,
        wet_verdicts,
    )
    from clickhouse_etl_loadtest_spark.queries.html import _warc_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frame = docs.select("doc_id", _warc_col().alias("warc"))
    good = (
        wet_verdicts(_walk_warc(frame))
        .where("keep_quality")
        .orderBy("doc_id")
        .first()["doc_id"]
    )
    w = frame.where(F.col("doc_id") == good).first()["warc"]
    wet_store = str(tmp_path / "wet_store")
    pack_state = str(tmp_path / "pack_state")
    wave0 = spark.createDataFrame([(10, w)], "doc_id long, warc string")
    i0 = curate_and_pack_batch(spark, wave0, wet_store, pack_state, 0)
    assert i0["n_docs"] == 1
    # wave 1 re-crawls doc 10 AND introduces doc 5 with identical content:
    # doc 5 wins the within-wave canon but the fingerprint was carried by
    # wave 0, so NOTHING new may enter the stream
    wave1 = spark.createDataFrame([(10, w), (5, w)], "doc_id long, warc string")
    i1 = curate_and_pack_batch(spark, wave1, wet_store, pack_state, 1)
    assert i1["n_docs"] == 0
    assert i1["end"] == i0["end"] == cursor(spark, pack_state)
    assert [r["doc_id"] for r in read_manifest(spark, pack_state).collect()] == [10]


def test_out_of_order_batch_replay_fails_loud(spark, tmp_path):
    """Re-delivering an OLDER batch after a newer one landed would read the
    newer cursor and rewrite the old manifest with wrong offsets; the
    operator must refuse (foreachBatch only ever replays the newest id)."""
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta epsilon")], "doc_id long, text string"
    )
    state = str(tmp_path / "pack_state")
    pack_batch(spark, df.where(F.col("doc_id") == 0), state, 0)
    pack_batch(spark, df.where(F.col("doc_id") == 1), state, 1)
    with pytest.raises(ValueError, match="out-of-order"):
        pack_batch(spark, df.where(F.col("doc_id") == 0), state, 0)


def test_empty_wave_advances_nothing(spark, tmp_path):
    """An empty micro-batch (a wave whose curation dropped everything) must
    land an empty manifest partition, leave the cursor where it was, and
    not disturb later waves' offsets."""
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta epsilon")], "doc_id long, text string"
    )
    state = str(tmp_path / "pack_state")
    i0 = pack_batch(spark, df.where(F.col("doc_id") == 0), state, 0)
    i1 = pack_batch(spark, df.where(F.col("doc_id") < 0), state, 1)  # empty
    i2 = pack_batch(spark, df.where(F.col("doc_id") == 1), state, 2)
    assert i1 == {"start": i0["end"], "end": i0["end"], "n_docs": 0}
    assert i2["start"] == i0["end"]
    m = {r["doc_id"]: r["start_offset"] for r in read_manifest(spark, state).collect()}
    assert m == {0: 0, 1: i0["end"]}
    assert cursor(spark, state) == i2["end"]


def test_pack_state_compaction_preserves_stream_and_floors_replays(
    spark, sf_dir, docs, tmp_path
):
    """compact_pack_state folds manifest partitions (pure concatenation —
    manifests are append-only) and keeps exactly the newest cursor at the
    floor; the packed stream continues IDENTICALLY afterwards (same
    manifest as an uncompacted drive, same cursor), and a (re)delivery at
    or below the floor fails loud."""
    from clickhouse_etl_loadtest_spark.operators.packstream import (
        compact_pack_state,
    )

    waves = _waves(docs)

    def drive(tag, compact_after=None):
        state = str(tmp_path / f"pack_{tag}")
        for bid, wave in enumerate(waves):
            pack_batch(spark, docs.where(F.col("doc_id").isin(wave)), state, bid)
            if compact_after is not None and bid == compact_after:
                info = compact_pack_state(spark, state, upto_batch_id=bid)
                assert info["floor"] == bid and info["cursor_rows"] == 1
        return state

    plain = drive("plain")
    compacted = drive("compacted", compact_after=1)
    assert _canon(read_manifest(spark, compacted)) == _canon(
        read_manifest(spark, plain)
    )
    assert cursor(spark, compacted) == cursor(spark, plain)

    # replay at or below the floor fails loud; above it replays still work
    from clickhouse_etl_loadtest_spark.operators.packstream import pack_lengths_batch

    df = spark.createDataFrame([(1, 5)], "doc_id long, len_tokens long")
    with pytest.raises(ValueError, match="compaction floor"):
        pack_lengths_batch(spark, df, compacted, 1)
    # re-deliver the last (post-floor) wave: unchanged state
    before = _canon(read_manifest(spark, compacted))
    last = len(waves) - 1
    pack_batch(
        spark, docs.where(F.col("doc_id").isin(waves[last])), compacted, last
    )
    assert _canon(read_manifest(spark, compacted)) == before
    # backward re-compaction fails loud; forward works
    with pytest.raises(ValueError, match="step backwards"):
        compact_pack_state(spark, compacted, upto_batch_id=0)
    info2 = compact_pack_state(spark, compacted, upto_batch_id=last)
    assert info2["floor"] == last
    assert _canon(read_manifest(spark, compacted)) == before
    assert cursor(spark, compacted) == cursor(spark, plain)


def test_rename_orphan_healed_by_next_ingest_wave(spark, sf_dir, docs, tmp_path):
    """A compaction that crashed AFTER the consolidated-dir renames but
    BEFORE the marker write leaves orphan ``batch=c*`` dirs the marker
    cannot see; the next ingest wave's UNCONDITIONAL recovery (round-13
    hardening of ``_pack_floor``) must remove them before reading state,
    restoring single-counted manifests and an uncorrupted cursor."""
    import shutil

    from clickhouse_etl_loadtest_spark.operators.packstream import compact_pack_state

    waves = _waves(docs)

    def build(tag, n):
        state = str(tmp_path / f"pack_{tag}")
        for bid in range(n):
            pack_batch(spark, docs.where(F.col("doc_id").isin(waves[bid])), state, bid)
        return state

    clean = build("clean", 2)
    compact_pack_state(spark, clean, upto_batch_id=1)

    crash = build("crash", 2)
    shutil.copytree(f"{clean}/manifest/batch=c1", f"{crash}/manifest/batch=c1")
    shutil.copytree(f"{clean}/cursor/batch=c1", f"{crash}/cursor/batch=c1")
    # dirty window: manifests double-counted until the next wave heals
    assert (
        spark.read.parquet(f"{crash}/manifest").count()
        > read_manifest(spark, clean).count()
    )
    pack_batch(spark, docs.where(F.col("doc_id").isin(waves[2])), crash, 2)

    want = build("plain", 3)
    assert _canon(read_manifest(spark, crash)) == _canon(read_manifest(spark, want))
    assert cursor(spark, crash) == cursor(spark, want)
