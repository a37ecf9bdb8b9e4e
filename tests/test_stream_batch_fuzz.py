"""Randomized streaming<->batch differential fuzzing for the stateful
operators — the generated-scenario complement to the fixed scenarios in
test_stateful.py / test_streaming_asof.py / test_streaming_window.py.

Design: a "scenario" is an independent KEY GROUP (the stateful operators
partition state by key), so hundreds of randomized scenarios ride through
ONE streaming query together instead of one query each — that is what makes
>=200 generated cases affordable inside the suite budget. Global knobs that
cannot vary per key (dedup window size, out-of-order fraction, session gap)
become the parametrize axes; per-scenario randomness (event counts, dup
fan-out, timestamps, wave assignment) comes from a seeded RNG so every run
fuzzes the same reproducible corpus.

Out-of-order arrival is exercised ACROSS micro-batches: each event is
randomly assigned to wave 1 or wave 2, so wave 2 delivers events whose
event time precedes wave 1's maximum. Timestamp spans are kept inside the
watermark delay, so no generated event is ever late-DROPPED — late-data
drop and state eviction have their own dedicated tests; here every event
must be accounted for, which is what makes exact set-equality with the
batch twin assertable.
"""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_loadtest_spark.operators.asof import asof_join
from clickhouse_etl_loadtest_spark.streaming.stateful import (
    dedup_with_counts,
    streaming_asof_join,
)
from clickhouse_etl_loadtest_spark.streaming.windows import session_counts

BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros


def _iso(offset_s: float) -> str:
    # exact-ms domain: offsets are generated at ms granularity, and float
    # seconds would otherwise truncate a microsecond on conversion
    us = BASE_US + int(round(offset_s * 1000)) * 1000
    import datetime

    dt = datetime.datetime.fromtimestamp(us / 1e6, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"


def _write_wave(dirpath: str, fname: str, records: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def _drain(spark, build_query, src: str, sink_dir: str, ckpt: str, mode: str) -> None:
    out = build_query(spark)

    def collect(df, batch_id):
        df.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(240)
    if not finished:
        q.stop()
    assert finished, "fuzz wave did not drain in 240s"


# --- dedup_with_counts ----------------------------------------------------------

N_DEDUP_SCENARIOS = 50
DEDUP_SCHEMA = "event_id string, payload string, timestamp timestamp"


@pytest.mark.parametrize(
    "window,ooo_fraction,seed",
    [
        ("30m", 0.0, 101),
        ("30m", 0.4, 102),
        ("2h", 0.0, 103),
        ("2h", 0.4, 104),
    ],
)
def test_fuzz_dedup_with_counts_matches_batch(spark, tmp_path, window, ooo_fraction, seed):
    """50 scenarios per config x 4 configs = 200 generated dedup cases:
    streaming cumulative (key, n_duplicates, first_ts) must equal the batch
    twin (groupBy key: count-1, min ts — dedup_counts_events' shape), with
    first_ts compared under streaming's first-ARRIVAL semantics: the
    operator pins first_ts to the earliest event time in the micro-batch
    that first saw the key, which equals the global minimum unless
    out-of-order delivery routed the earliest event to a later wave."""
    rng = random.Random(seed)
    window_s = 1800 if window == "30m" else 7200
    span = window_s // 2  # all per-key event times within half the window

    waves: dict[int, list[dict]] = {1: [], 2: []}
    expected_dups: dict[str, int] = {}
    expected_first_us: dict[str, int] = {}
    for s in range(N_DEDUP_SCENARIOS):
        key = f"k{s:03d}"
        n = rng.randint(1, 6)
        # integer milliseconds: _iso emits ms precision, so sub-ms offsets
        # would silently truncate and break exact first_ts comparison
        offsets = sorted(rng.randrange(span * 1000) / 1000.0 for _ in range(n))
        wave_of = [1 if rng.random() >= ooo_fraction else 2 for _ in range(n)]
        if 1 not in wave_of:
            wave_of[rng.randrange(n)] = 1  # every key is seen in wave 1
        for off, w in zip(offsets, wave_of):
            waves[w].append(
                {"event_id": key, "payload": f"p{s}", "timestamp": _iso(off)}
            )
        expected_dups[key] = n - 1
        first_wave_offsets = [o for o, w in zip(offsets, wave_of) if w == 1]
        expected_first_us[key] = int(round(min(first_wave_offsets) * 1000)) * 1000

    for w in (1, 2):
        rng.shuffle(waves[w])  # arrival order within a wave is arbitrary

    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    def build(spark_):
        stream = spark_.readStream.schema(DEDUP_SCHEMA).json(src)
        return dedup_with_counts(stream, "event_id", window)

    _write_wave(src, "w1.json", waves[1])
    _drain(spark, build, src, sink, ckpt, "update")
    if waves[2]:
        _write_wave(src, "w2.json", waves[2])
        _drain(spark, build, src, sink, ckpt, "update")

    rows = spark.read.parquet(sink).collect()
    # update mode: keep the LAST (cumulative) emit per key
    final: dict[str, tuple] = {}
    firsts: dict[str, int] = {}
    for r in rows:
        prev = final.get(r["key"])
        if prev is None or r["n_duplicates"] >= prev[0]:
            final[r["key"]] = (r["n_duplicates"], r["first_ts"])
        firsts[r["key"]] = firsts.get(r["key"], 0) + r["is_first_emit"]

    assert set(final) == set(expected_dups)
    for key, want in expected_dups.items():
        got_dups, got_first = final[key]
        assert got_dups == want, f"{key}: n_duplicates {got_dups} != {want}"
        got_first_us = int(got_first.timestamp() * 1_000_000) - BASE_US
        assert got_first_us == expected_first_us[key], f"{key}: first_ts off"
        assert firsts[key] == 1, f"{key}: is_first_emit fired {firsts[key]} times"

    # and the batch twin agrees on the duplicate accounting
    all_recs = waves[1] + waves[2]
    batch = spark.createDataFrame(
        [(r["event_id"], r["timestamp"]) for r in all_recs],
        "event_id string, timestamp string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    twin = {
        r["event_id"]: r["n_duplicates"]
        for r in batch.groupBy("event_id")
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("n_duplicates"))
        .collect()
    }
    assert twin == expected_dups
    assert {k: v[0] for k, v in final.items()} == twin


# --- streaming_asof_join --------------------------------------------------------

N_ASOF_SCENARIOS = 60
ASOF_SCHEMA = "user_id string, kind string, rid string, ts timestamp"
SENTINEL = "zzz_sentinel"


def test_fuzz_streaming_asof_matches_batch(spark, tmp_path):
    """60 generated key scenarios (random left/right counts, times, wave
    assignment) through ONE streaming as-of query: after a sentinel advances
    the watermark past every real event, the emitted matches must equal the
    batch asof_join row-for-row (backward, exact allowed). (key, right_ts)
    pairs are generated unique — the documented equality precondition."""
    rng = random.Random(4242)
    span = 300.0  # all real events inside 5 minutes; watermark delay 15m

    waves: dict[int, list[dict]] = {1: [], 2: []}
    lefts: list[tuple[str, float, str]] = []
    rights: list[tuple[str, float, str]] = []
    for s in range(N_ASOF_SCENARIOS):
        key = f"u{s:03d}"
        n_left = rng.randint(1, 4)
        n_right = rng.randint(0, 4)
        right_offsets = rng.sample(range(int(span * 10)), n_right)  # unique deci-seconds
        for i in range(n_left):
            off = rng.uniform(0, span)
            rid = f"L{s}_{i}"
            lefts.append((key, off, rid))
            waves[rng.randint(1, 2)].append(
                {"user_id": key, "kind": "purchase", "rid": rid, "ts": _iso(off)}
            )
        for i, doff in enumerate(right_offsets):
            off = doff / 10.0
            rid = f"R{s}_{i}"
            rights.append((key, off, rid))
            waves[rng.randint(1, 2)].append(
                {"user_id": key, "kind": "click", "rid": rid, "ts": _iso(off)}
            )
    for w in (1, 2):
        rng.shuffle(waves[w])

    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    def build(spark_):
        stream = spark_.readStream.schema(ASOF_SCHEMA).json(src)
        return streaming_asof_join(
            stream.where(F.col("kind") == "purchase"),
            stream.where(F.col("kind") == "click"),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            left_payload=["rid"],
            right_payload=["rid"],
            watermark="15 minutes",
            right_retention="6h",
        )

    _write_wave(src, "w1.json", waves[1])
    _drain(spark, build, src, sink, ckpt, "append")
    _write_wave(src, "w2.json", waves[2])
    _drain(spark, build, src, sink, ckpt, "append")
    # sentinel: push the watermark a day past everything -> all lefts finalize
    _write_wave(
        src, "w3.json", [{"user_id": SENTINEL, "kind": "purchase", "rid": "S", "ts": _iso(86400)}]
    )
    _drain(spark, build, src, sink, ckpt, "append")

    # payload columns travel JSON-encoded through the state schema
    def _rid(blob):
        return None if blob is None else json.loads(blob)["rid"]

    got = {
        (r["key"], _rid(r["left_payload"]), _rid(r["right_payload"]))
        for r in spark.read.parquet(sink).collect()
        if r["key"] != SENTINEL
    }

    left_df = spark.createDataFrame(
        [(k, _iso(o), rid) for k, o, rid in lefts], "user_id string, ts string, rid string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right_df = spark.createDataFrame(
        [(k, _iso(o), rid) for k, o, rid in rights], "user_id string, ts string, rid string"
    ).withColumn("ts", F.to_timestamp("ts"))
    twin = {
        (r["user_id"], r["rid"], r["rid_asof"])
        for r in asof_join(
            left_df, right_df, on="user_id", left_ts="ts", right_cols=["rid"]
        ).collect()
    }
    assert len(got) == len(lefts)  # every left emitted exactly once
    assert got == twin


# --- session_counts -------------------------------------------------------------

N_SESSION_SCENARIOS = 45
SESSION_SCHEMA = "user_id string, timestamp timestamp"


@pytest.mark.parametrize("gap_s,seed", [(300, 7001), (900, 7002)])
def test_fuzz_session_windows_match_batch(spark, tmp_path, gap_s, seed):
    """45 scenarios x 2 gap configs = 90 generated sessionization cases: the
    finalized streaming sessions (after a sentinel closes every window) must
    equal batch lag/cumsum sessionization — same (start, end, n_events) per
    key, where end = last event + gap and a difference of exactly ``gap``
    starts a new session (session_window's end bound is exclusive)."""
    rng = random.Random(seed)
    span = 3600.0

    waves: dict[int, list[dict]] = {1: [], 2: []}
    events: list[tuple[str, float]] = []
    for s in range(N_SESSION_SCENARIOS):
        key = f"g{s:03d}"
        n = rng.randint(1, 8)
        offs = sorted({round(rng.uniform(0, span), 1) for _ in range(n)})
        for off in offs:
            events.append((key, off))
            waves[rng.randint(1, 2)].append({"user_id": key, "timestamp": _iso(off)})
    for w in (1, 2):
        rng.shuffle(waves[w])

    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    def build(spark_):
        stream = spark_.readStream.schema(SESSION_SCHEMA).json(src)
        return session_counts(
            stream, gap=f"{gap_s}s", late_threshold="3h", keys=["user_id"]
        )

    _write_wave(src, "w1.json", waves[1])
    _drain(spark, build, src, sink, ckpt, "append")
    _write_wave(src, "w2.json", waves[2])
    _drain(spark, build, src, sink, ckpt, "append")
    _write_wave(src, "w3.json", [{"user_id": SENTINEL, "timestamp": _iso(864000)}])
    _drain(spark, build, src, sink, ckpt, "append")

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
        if r["user_id"] != SENTINEL
    }

    # batch twin: lag/cumsum sessionization (the events_session_windows shape)
    df = spark.createDataFrame(
        [(k, _iso(o)) for k, o in events], "user_id string, timestamp string"
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("timestamp")
    sess = (
        df.withColumn("prev_ts", F.lag("timestamp").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.col("timestamp").cast("double") - F.col("prev_ts").cast("double") >= gap_s)
            ).cast("int"),
        )
        .withColumn("session_no", F.sum("new_session").over(w))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("timestamp").alias("session_start"),
            (F.max("timestamp") + F.expr(f"INTERVAL {gap_s} SECONDS")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    twin = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sess.collect()
    }
    assert got == twin
