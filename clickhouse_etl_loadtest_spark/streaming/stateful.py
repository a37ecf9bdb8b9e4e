"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dropDuplicatesWithinWatermark`` implements the reference's dedup (D1,
SURVEY.md §2.3) but is all-or-nothing: it cannot REPORT what it suppressed.
The reference's harness derives duplicate counts externally from the
generator (``result_total_duplicates``, /root/reference/src/utils/publish.py:61-65);
at 100 TB you want the pipeline itself to account for them. This module adds
that: a keyed first-wins dedup that also maintains a per-key suppressed-
duplicate count in the state store, with event-time timeout eviction bounding
state exactly like the reference's ``time_window``.

This is the (b) tier of the custom-operator ladder (task brief): semantics
the built-in operators genuinely can't express, done with Arrow-batched
``applyInPandasWithState`` — grouped state, not a row-at-a-time Python UDF.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config.durations import parse_duration

if TYPE_CHECKING:
    import pandas as pd


def _output_schema() -> StructType:
    return StructType(
        [
            StructField("key", StringType()),
            StructField("first_ts", TimestampType()),
            StructField("n_duplicates", LongType()),
            StructField("is_first_emit", IntegerType()),
        ]
    )


def _state_schema() -> StructType:
    # (first-seen epoch micros, suppressed count)
    return StructType([StructField("first_us", LongType()), StructField("dups", LongType())])


def dedup_with_counts(
    df: DataFrame,
    key: str,
    time_window: str,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming first-wins dedup that EMITS per-key duplicate counts.

    Output (update mode): one row per key per micro-batch that touched it —
    ``is_first_emit=1`` on first sight (the "kept" record signal), and the
    cumulative ``n_duplicates`` suppressed so far. State for a key is evicted
    by event-time timeout once the watermark passes ``first_ts +
    time_window`` — the same bounded-window semantics as the reference's
    NATS-KV dedup store (W4) and our ``dropDuplicatesWithinWatermark`` path.

    Scale: state is 16 bytes/key in RocksDB; rows arrive grouped by key, so
    the only shuffle is the groupBy hash exchange — identical shape to the
    built-in dedup.
    """
    window_us = int(parse_duration(time_window) * 1_000_000)

    def fn(
        key_tuple: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        n_rows = 0
        min_ts_us = None
        for pdf in pdfs:
            n_rows += len(pdf)
            batch_min = pdf[ts_col].min()
            ts_us = int(batch_min.value // 1_000)  # pandas Timestamp ns -> us
            min_ts_us = ts_us if min_ts_us is None else min(min_ts_us, ts_us)

        if state.exists:
            first_us, dups = state.get
            dups += n_rows  # every row while state lives is a re-send
            first_emit = 0
        else:
            first_us, dups = min_ts_us, n_rows - 1  # first row kept
            first_emit = 1
        state.update((first_us, dups))
        # event-time timeouts must be strictly later than the current
        # watermark — a re-send arriving after other keys advanced the
        # watermark past first_ts+window would otherwise crash the query
        timeout_ms = max(
            (first_us + window_us) // 1_000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)

        yield pd.DataFrame(
            {
                "key": [key_tuple[0]],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "n_duplicates": [dups],
                "is_first_emit": [first_emit],
            }
        )

    from ..config.durations import duration_to_interval

    watermarked = df.withWatermark(ts_col, duration_to_interval(time_window))
    return watermarked.groupBy(key).applyInPandasWithState(
        fn,
        _output_schema(),
        _state_schema(),
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )



# --- streaming event-time as-of join --------------------------------------------------

def _asof_output_schema() -> StructType:
    return StructType(
        [
            StructField("key", StringType()),
            StructField("left_ts", TimestampType()),
            StructField("left_payload", StringType()),
            StructField("right_ts", TimestampType()),
            StructField("right_payload", StringType()),
        ]
    )


def _asof_state_schema() -> StructType:
    # JSON-encoded buffers of [epoch_us, payload] pairs; bounded by the
    # watermark delay (lefts) and right_retention (rights — pruned inline in
    # streaming_asof_join's fn, see the retention comment there)
    return StructType([StructField("lefts", StringType()), StructField("rights", StringType())])


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_payload: list[str] | None = None,
    right_payload: list[str] | None = None,
    watermark: str = "10 seconds",
    right_retention: str = "1h",
) -> DataFrame:
    """Streaming as-of join (backward, exact matches allowed): every left row
    is matched to the single right row with the greatest ``right_ts <=
    left_ts`` per key — the event-time twin of ``operators/asof.py`` and an
    operator Structured Streaming lacks natively (stream-stream joins are
    equi/interval, and `dropDuplicates`-style state can't express "latest
    prior row").

    Correctness under out-of-order arrival: a left row at event time T is
    only FINALIZED (emitted, append mode) once the watermark moves strictly
    past T — Spark admits events with ``ts >= watermark``, so a right row at
    exactly T can still arrive while ``T == watermark``. Until then both
    sides buffer in the state store. While lefts are buffered, an event-time
    timeout at ``watermark + 1ms`` re-fires the key on every watermark
    advance to flush them; keys holding only right-side state do NOT re-arm
    per advance (that would make each micro-batch O(all keys ever seen)) —
    they sleep until ``last_right_ts + right_retention`` and are then
    evicted entirely.

    State bounds (per key, RocksDB-backed like every stateful op here):
    lefts ≤ rows inside one watermark delay; rights = rows newer than the
    watermark PLUS exactly one below it (an older right can never win an
    as-of match again — every future left has ``ts >= watermark``). A key
    idle past ``right_retention`` is dropped, so total state is bounded by
    ACTIVE keys, at the documented cost that a left arriving later than
    ``right_retention`` after its key's last right row sees no match.

    Parity with the batch operator holds whenever ``(key, right_ts)`` is
    unique (the same condition under which the batch tie-break is
    deterministic); on exact right_ts ties the streaming side breaks them
    lexicographically on the JSON payload rather than by column values.

    Payload columns travel as JSON strings (parse back with ``from_json``);
    the operator is data-shape-generic without needing a per-use schema.
    """
    import json as _json

    lp = [c for c in left.columns if c not in (on, left_ts)] if left_payload is None else left_payload
    rp = [c for c in right.columns if c not in (on, right_ts)] if right_payload is None else right_payload
    retention_us = int(parse_duration(right_retention) * 1_000_000)
    from pyspark.sql import functions as F

    def _payload_expr(cols: list[str]):
        # a payload-less side (pure existence/recency enrichment) rides an
        # empty JSON object — F.struct() with zero fields is not valid
        return F.to_json(F.struct(*[F.col(c) for c in cols])) if cols else F.lit("{}")

    l_tag = left.select(
        F.col(on).cast("string").alias("key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        _payload_expr(lp).alias("_payload"),
    )
    r_tag = right.select(
        F.col(on).cast("string").alias("key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        _payload_expr(rp).alias("_payload"),
    )
    unioned = l_tag.unionByName(r_tag).withWatermark("_ts", watermark)

    def fn(
        key_tuple: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        lefts, rights = [], []
        if state.exists:
            stored_l, stored_r = state.get
            lefts = _json.loads(stored_l)
            rights = _json.loads(stored_r)

        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, side, payload in zip(pdf["_ts"], pdf["_side"], pdf["_payload"]):
                    entry = [int(ts.value // 1_000), payload]  # pandas ns -> us
                    (lefts if side == 1 else rights).append(entry)

        wm_us = state.getCurrentWatermarkMs() * 1_000
        rights.sort()
        # STRICTLY below the watermark: Spark admits events at ts >= watermark,
        # so a right row timestamped exactly at the watermark can still arrive
        # and would be a legal exact-time match for a left at the same instant
        emit = sorted(e for e in lefts if e[0] < wm_us)
        lefts = [e for e in lefts if e[0] >= wm_us]

        if emit:
            rows = []
            for l_us, l_payload in emit:
                match = None
                for e in rights:  # sorted ascending; keep the last <= l_us
                    if e[0] <= l_us:
                        match = e
                    else:
                        break
                rows.append(
                    {
                        "key": key_tuple[0],
                        "left_ts": pd.Timestamp(l_us, unit="us"),
                        "left_payload": l_payload,
                        "right_ts": pd.Timestamp(match[0], unit="us") if match else None,
                        "right_payload": match[1] if match else None,
                    }
                )
            yield pd.DataFrame(rows)

        # retention: one right below the watermark still serves future lefts
        # (they all have ts >= watermark); everything older is dead
        below = [e for e in rights if e[0] < wm_us]
        rights = ([below[-1]] if below else []) + [e for e in rights if e[0] >= wm_us]

        if lefts:
            state.update((_json.dumps(lefts), _json.dumps(rights)))
            # re-fire on the next watermark advance to flush buffered lefts
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif rights:
            last_right_us = rights[-1][0]
            # STRICTLY past the deadline: at wm == last_right + retention a
            # left timestamped exactly there is still admissible (Spark
            # admits ts >= watermark) and may match this right
            if state.hasTimedOut and wm_us > last_right_us + retention_us:
                state.remove()  # idle past right_retention: evict the key
            else:
                state.update((_json.dumps(lefts), _json.dumps(rights)))
                # sleep until the retention deadline — NOT per watermark
                # advance, or every historical key re-fires every micro-batch
                state.setTimeoutTimestamp(
                    max((last_right_us + retention_us) // 1_000, state.getCurrentWatermarkMs() + 1)
                )
        else:
            state.remove()

    return unioned.groupBy("key").applyInPandasWithState(
        fn,
        _asof_output_schema(),
        _asof_state_schema(),
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
