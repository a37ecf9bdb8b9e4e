"""Pipeline-parity queries: the reference's own dataflow (generate -> decode ->
dedup -> map/cast) plus the streaming-adjacent batch operators (tumbling /
session windows, as-of join) exercised on the ``events`` fixture table.

These are the batch analogues the correctness oracle can check; the true
streaming forms live in :mod:`clickhouse_etl_loadtest_spark.streaming` and are
covered by the pytest streaming suite (non-SQL-expressible, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import dedup_first_wins, dedup_within_window
from ..sources.generator import generate_user_events, generator_oracle_sql
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, name)


# --- the reference pipeline end-to-end, oracle-checked -----------------------

_E2E_TOTAL = 5500
_E2E_RATE = 0.1

_E2E_ORACLE = f"""
WITH generated AS ({generator_oracle_sql(_E2E_TOTAL, _E2E_RATE)}),
deduped AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY seq) AS _rn
        FROM generated
    ) WHERE _rn = 1
)
SELECT
    event_id,
    user_id,
    strptime(created_at, '%Y-%m-%d %H:%M:%S') AS created_at,
    name AS user_name,
    email AS user_email
FROM deduped
ORDER BY event_id
"""


@register("dedup_pipeline_e2e", _E2E_ORACLE, headline=True)
def dedup_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole job, oracle-checked end to end: glassgen-equivalent
    generation with duplication_rate, first-wins keyed dedup (D1 batch
    analogue), and the sink table_mapping projection/rename/cast (P1)
    (/root/reference/config/glassflow/deduplication_pipeline.json:1-101).

    The DuckDB oracle regenerates the SAME synthetic data from the seeded
    generator SQL and applies SQL dedup + mapping — a row-level-value check
    the reference itself never had (it only compared counts,
    /root/reference/src/pipeline_test.py:13-45).
    """
    ev = generate_user_events(spark, _E2E_TOTAL, _E2E_RATE)
    deduped = dedup_first_wins(ev, "event_id", order_col="seq")
    return deduped.select(
        "event_id",
        "user_id",
        F.to_timestamp("created_at", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
        F.col("name").alias("user_name"),
        F.col("email").alias("user_email"),
    ).orderBy("event_id")


# --- dedup on the events fixture ---------------------------------------------

_DEDUP_EVENTS_ORACLE = """
SELECT user_id, event_type, event_id, ts, value
FROM (
    SELECT user_id, event_type, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS _rn
    FROM events
) WHERE _rn = 1
ORDER BY user_id, event_type
"""


@register("dedup_first_event_per_user_type", _DEDUP_EVENTS_ORACLE, extra=True)
def dedup_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup on a composite key over the events table.

    Scale: aggregate-then-rejoin instead of a row_number window — groupBy gets
    map-side combine and AQE skew splitting; a window would sort every key
    partition (see operators/dedup.py docstring).

    ``extra``: D1's batch analogue keeps two driver-visible entries
    (dedup_pipeline_e2e, dedup_within_window_events); this plain-composite-key
    twin yields its registry slot to doc_dup_clusters (50-entry driver cap)
    and stays value-checked in the pytest oracle sweep.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        dedup_first_wins(ev, ["user_id", "event_type"], order_col="event_id")
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    )


_DEDUP_WINDOWED_ORACLE = """
SELECT user_id, event_type, event_id, ts
FROM (
    SELECT user_id, event_type, event_id, ts,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY event_id) AS _rn
    FROM events
) WHERE _rn = 1
ORDER BY event_id
"""


@register("dedup_within_window_events", _DEDUP_WINDOWED_ORACLE, extra=True)
def dedup_within_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup (D1 batch analogue): first record per key per tumbling
    1h window — the bounded-state form of the reference's ``time_window``
    dedup (deduplication_pipeline.json:48)."""
    ev = _t(spark, sf_dir, "events")
    return (
        dedup_within_window(ev, ["user_id", "event_type"], "1h", ts_col="ts", order_col="event_id")
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("event_id")
    )


# --- table mapping on events ---------------------------------------------------

_MAPPING_ORACLE = """
SELECT
    CAST(event_id AS VARCHAR) AS id,
    ts AS event_time,
    event_type AS type,
    CAST(user_id AS VARCHAR) AS uid,
    CAST(value AS DOUBLE) AS amount
FROM events
ORDER BY id
"""


@register("table_mapping_events", _MAPPING_ORACLE, extra=True)
def table_mapping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 projection/rename/cast against the fixture: column subset, renames,
    string casts — mirrors table_mapping semantics
    (deduplication_pipeline.json:68-99) on real data."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("ts").alias("event_time"),
        F.col("event_type").alias("type"),
        F.col("user_id").cast("string").alias("uid"),
        F.col("value").cast("double").alias("amount"),
    ).orderBy("id")


# --- JSON decode (S6) -----------------------------------------------------------

_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
FROM events
ORDER BY event_id
"""


@register("json_decode_props", _JSON_ORACLE, extra=True)
def json_decode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode against a declared schema (S6): the events fixture carries
    a JSON ``props`` payload, decoded with ``from_json`` (JVM-side) exactly as
    the Kafka topic payload is (deduplication_pipeline.json:19-43)."""
    ev = _t(spark, sf_dir, "events")
    schema = "struct<k: bigint>"
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), schema)["k"].alias("prop_k"),
    ).orderBy("event_id")


# --- tumbling window aggregation (W2) -------------------------------------------

_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_tumbling_1h", _TUMBLING_ORACLE, extra=True)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the batch form of the
    streaming windowed agg (W2). ``F.window`` and DuckDB ``time_bucket`` are
    both epoch-aligned so buckets match exactly."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value", "unique_users")
        .orderBy("window_start", "event_type")
    )


# --- session windows --------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL {_SESSION_GAP_MIN} MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), numbered AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_no
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_last,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@register("events_session_windows", _SESSION_ORACLE, extra=True)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min inactivity gap) via ``F.session_window`` — the
    operator Structured Streaming uses for session aggregation; the oracle
    reproduces it with gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_last"), F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "session_start", "session_last", "n_events")
        .orderBy("user_id", "session_start")
    )


# --- as-of join (temporal) ----------------------------------------------------------

_ASOF_ORACLE = """
SELECT p.event_id,
       p.user_id,
       p.ts,
       p.value AS purchase_value,
       c.ts AS last_click_ts,
       c.event_id AS last_click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("asof_join_purchase_click", _ASOF_ORACLE, extra=True)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join: each purchase matched to the user's most recent
    click at-or-before it — the J1 temporal-join family (SURVEY.md §2.4),
    via the generic :func:`..operators.asof.asof_join` operator (union +
    running last-non-null window: one shuffle, no range explosion — Spark
    has no native ASOF join and the inequality-join formulation goes
    nested-loop at scale)."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("last_click_ts"), F.col("event_id").alias("last_click_id")
    )
    out = asof_join(p, c, "user_id", left_ts="ts", right_ts="last_click_ts",
                    right_cols=["last_click_id"])
    return out.select(
        "event_id", "user_id", "ts", "purchase_value",
        F.col("last_click_ts_asof").alias("last_click_ts"),
        F.col("last_click_id_asof").alias("last_click_id"),
    ).orderBy("event_id")


# --- interval join --------------------------------------------------------------------

_INTERVAL_ORACLE = """
SELECT e.event_id, e.user_id, e.ts, e.value,
       o.o_orderkey, o.o_totalprice
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
JOIN orders o
  ON e.user_id = o.o_custkey
 AND o.o_orderdate BETWEEN e.ts - INTERVAL 10000 DAY AND e.ts
ORDER BY e.event_id, o.o_orderkey
"""


@register("interval_join_events_orders", _INTERVAL_ORACLE, extra=True)
def interval_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + time-range predicate — the batch analogue of the
    watermarked stream-stream interval join (J1). The equi key carries the
    shuffle; the range is a post-join filter, so no nested-loop blowup."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    o = _t(spark, sf_dir, "orders")
    cond = (
        (ev.user_id == o.o_custkey)
        & (o.o_orderdate >= ev.ts - F.expr("INTERVAL 10000 DAYS"))
        & (o.o_orderdate <= ev.ts)
    )
    return (
        ev.join(o, cond)
        .select("event_id", "user_id", "ts", "value", "o_orderkey", "o_totalprice")
        .orderBy("event_id", "o_orderkey")
    )


@register("interval_join_events_orders_salted", _INTERVAL_ORACLE, extra=True)
def interval_join_events_orders_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-scale variant of the interval join: the equi key is
    salted (operators/scale.py::salted_join — hot-key replication on the
    orders side), so one power-law user cannot serialize the shuffle join
    into a single straggler task; the range predicate stays a post-join
    filter exactly as in the plain form. Same oracle — salting never
    changes the result set, only the key distribution (plan-asserted in
    tests/test_scale_ops.py). AQE's skew splitting handles moderate skew
    without this; the salted form is for the pathological key that exceeds
    a single task even after AQE splits, and for foreachBatch contexts
    where AQE does not apply."""
    from ..operators.scale import salted_join

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    # merge hint: at fact scale neither side fits a broadcast, so the salted
    # shuffle join IS the plan — the hint keeps the small fixtures from
    # auto-broadcasting their way around the very shape this variant pins
    joined = salted_join(ev.hint("merge"), o, on="user_id", salt_buckets=16)
    return (
        joined.where(
            (F.col("o_orderdate") >= F.col("ts") - F.expr("INTERVAL 10000 DAYS"))
            & (F.col("o_orderdate") <= F.col("ts"))
        )
        .select("event_id", "user_id", "ts", "value", "o_orderkey", "o_totalprice")
        .orderBy("event_id", "o_orderkey")
    )


# --- dedup with duplicate accounting (batch analogue of the stateful op) ----------

_DEDUP_COUNTS_ORACLE = """
SELECT user_id, event_type,
       MIN(ts) AS first_ts,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_duplicates
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


@register("dedup_counts_events", _DEDUP_COUNTS_ORACLE, extra=True)
def dedup_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup with duplicate ACCOUNTING: per key, the first-seen timestamp and
    how many re-sends were suppressed — the batch analogue of the custom
    stateful streaming operator ``streaming/stateful.py::dedup_with_counts``
    (applyInPandasWithState), whose semantics neither ``dropDuplicates`` nor
    ``dropDuplicatesWithinWatermark`` can express (they drop silently).

    Scale: one partially-aggregated groupBy — the counting rides the same
    shuffle the dedup itself needs."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.min("ts").alias("first_ts"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_duplicates"),
        )
        .orderBy("user_id", "event_type")
    )


# --- windowed spike detection (monitoring on the event stream) -----------------------

_SPIKE_ORACLE = """
WITH hourly AS (
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
trailed AS (
    SELECT window_start, event_type, n_events,
           LAG(n_events, 1) OVER w AS p1,
           LAG(n_events, 2) OVER w AS p2,
           LAG(n_events, 3) OVER w AS p3
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
)
SELECT window_start, event_type, n_events,
       CAST(p1 + p2 + p3 AS BIGINT) AS prev3_total,
       (p1 IS NOT NULL AND p2 IS NOT NULL AND p3 IS NOT NULL
        AND 3 * n_events > 2 * (p1 + p2 + p3)) AS is_spike
FROM trailed
ORDER BY window_start, event_type
"""


@register("events_spike_detection", _SPIKE_ORACLE, extra=True)
def events_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed spike detection: flag any hourly (window, event_type) bucket
    whose count exceeds 2x the mean of its three trailing buckets — the
    monitoring/alerting pass that runs beside an ETL pipeline. The
    comparison is pure integer arithmetic (3*n > 2*(p1+p2+p3), i.e.
    n > 2 * (p1+p2+p3)/3), so the flag is exact in both engines; absent
    hours are missing rows (not zeros) in both, keeping lag semantics
    identical.

    Scale: the hourly rollup is one partial-aggregated shuffle on
    (window, type); the trailing window partitions by event_type over
    bucket-level rows — thousands of rows per type regardless of corpus
    size, never event-level data.
    """
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    w = Window.partitionBy("event_type").orderBy("window_start")
    p1, p2, p3 = (F.lag("n_events", k).over(w) for k in (1, 2, 3))
    prev3 = p1 + p2 + p3
    return (
        hourly.select(
            "window_start",
            "event_type",
            "n_events",
            prev3.cast("bigint").alias("prev3_total"),
            (
                p1.isNotNull() & p2.isNotNull() & p3.isNotNull()
                & (3 * F.col("n_events") > 2 * prev3)
            ).alias("is_spike"),
        )
        .orderBy("window_start", "event_type")
    )


# --- windowFunnel equivalent (ClickHouse parity) -------------------------------------

# ClickHouse's windowFunnel(window)(ts, cond1, cond2, ...) is the signature
# event-analytics operator of the reference's sink engine. Semantics here
# (documented, exists-chain form): funnel_level(user) = the deepest L such
# that SOME chain t1 < t2 < ... < tL exists with step_i matching the i-th
# event type and every t_i within [t1, t1 + window]. For a fixed t1 the
# greedy "earliest next step" choice is optimal (a smaller t2 only enlarges
# the candidate set for t3), so existence reduces to a min-filter chain —
# evaluable entirely with higher-order array functions, no join, no window.
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 2 * 3600 * 1_000_000  # 2 hours
_FUNNEL_INF = 9_223_372_036_854_775_807

_WINDOW_FUNNEL_CORE = f"""
WITH per_user AS (
    SELECT user_id,
           list(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS a1,
           list(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS a2,
           list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS a3
    FROM events GROUP BY user_id
),
lv AS (
    SELECT user_id,
           COALESCE(len(a1), 0) > 0 AS r1,
           len(list_filter(COALESCE(a1, []), t1 ->
               len(list_filter(COALESCE(a2, []), t2 ->
                   t2 > t1 AND t2 <= t1 + {_FUNNEL_WINDOW_US})) > 0)) > 0 AS r2,
           len(list_filter(COALESCE(a1, []), t1 ->
               len(list_filter(COALESCE(a3, []), t3 ->
                   t3 <= t1 + {_FUNNEL_WINDOW_US} AND
                   t3 > COALESCE(list_min(list_filter(COALESCE(a2, []), t2 ->
                       t2 > t1 AND t2 <= t1 + {_FUNNEL_WINDOW_US})), {_FUNNEL_INF})
               )) > 0)) > 0 AS r3
    FROM per_user
)
SELECT user_id,
       CAST(CASE WHEN r3 THEN 3 WHEN r2 THEN 2 WHEN r1 THEN 1 ELSE 0 END AS INT)
           AS funnel_level
FROM lv
"""

# per-query ORDER BY appended here; the conversion rollup reuses the
# ORDER-BY-free core directly (no fragile string surgery on a sibling)
_WINDOW_FUNNEL_ORACLE = _WINDOW_FUNNEL_CORE + "ORDER BY user_id\n"


@register("events_window_funnel", _WINDOW_FUNNEL_ORACLE, extra=True)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel depth over the step sequence _FUNNEL_STEPS within a
    2-hour window — the ``windowFunnel`` capability of the reference's sink
    engine, re-expressed Spark-first.

    Scale: ONE shuffle (groupBy user_id with collect_list partial
    aggregation); the chain search runs inside each user's arrays via
    higher-order functions — JVM codegen, no self-joins, no per-step join
    cascade, no Python. Per-user event counts are bounded in practice
    (sessions, not corpora); pathological users degrade that user's task
    only. Timestamps compare as epoch micros (exact integers in both
    engines).
    """
    # fixture ts is TIMESTAMP_NTZ — cast through TIMESTAMP (session tz UTC,
    # no DST discontinuity; same recipe as operators/asof.py) for unix_micros
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    step = lambda s: F.sort_array(
        F.collect_list(F.when(F.col("event_type") == s, ts_us))
    )  # noqa: E731 — collect_list drops the non-matching nulls
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(step("view").alias("a1"), step("click").alias("a2"), step("purchase").alias("a3"))
    )
    w = F.lit(_FUNNEL_WINDOW_US)
    inf = F.lit(_FUNNEL_INF)
    next_min = lambda arr, lo, hi: F.coalesce(  # noqa: E731
        F.array_min(F.filter(arr, lambda t: (t > lo) & (t <= hi))), inf
    )
    r2 = F.exists(
        F.col("a1"), lambda t1: F.size(F.filter(F.col("a2"), lambda t2: (t2 > t1) & (t2 <= t1 + w))) > 0
    )
    r3 = F.exists(
        F.col("a1"),
        lambda t1: F.size(
            F.filter(
                F.col("a3"),
                lambda t3: (t3 <= t1 + w) & (t3 > next_min(F.col("a2"), t1, t1 + w)),
            )
        )
        > 0,
    )
    level = (
        F.when(r3, 3).when(r2, 2).when(F.size("a1") > 0, 1).otherwise(0).cast("int")
    )
    return per_user.select("user_id", level.alias("funnel_level")).orderBy("user_id")


# --- retention cohorts (ClickHouse `retention` parity) -------------------------------

_RETENTION_OFFSETS = (1, 7)

_RETENTION_ORACLE = f"""
WITH per_user AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day,
           list(DISTINCT CAST(ts AS DATE)) AS days
    FROM events GROUP BY user_id
),
flags AS (
    SELECT user_id, first_day,
           {", ".join(f"len(list_filter(days, d -> d = first_day + {k})) > 0 AS back_{k}" for k in _RETENTION_OFFSETS)}
    FROM per_user
)
SELECT strftime(first_day, '%Y-%m-%d') AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       {", ".join(f"CAST(SUM(CASE WHEN back_{k} THEN 1 ELSE 0 END) AS BIGINT) AS retained_{k}d" for k in _RETENTION_OFFSETS)}
FROM flags
GROUP BY first_day
ORDER BY cohort_day
"""


@register("events_retention_cohorts", _RETENTION_ORACLE, extra=True)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention: users grouped by their first active day, with
    counts of who returned exactly N days later (N in _RETENTION_OFFSETS)
    — the ``retention`` aggregate of the reference's sink engine.

    Scale: one groupBy(user_id) collecting DISTINCT active DAYS (bounded by
    the calendar, not event volume — partial aggregation dedups map-side),
    then one cohort-keyed rollup. No joins, no windows; both shuffles carry
    (user_id, small date array) / (date, counters).
    """
    d = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    per_user = d.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.collect_set("day").alias("days")
    )
    def _came_back(k: int):
        # closure (not a default arg) so PySpark sees a unary lambda
        return F.exists(F.col("days"), lambda x: x == F.date_add(F.col("first_day"), k))

    flags = per_user.select(
        "first_day",
        *[_came_back(k).alias(f"back_{k}") for k in _RETENTION_OFFSETS],
    )
    return (
        flags.groupBy(F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            *[
                F.sum(F.col(f"back_{k}").cast("int")).alias(f"retained_{k}d")
                for k in _RETENTION_OFFSETS
            ],
        )
        .orderBy("cohort_day")
    )


_FUNNEL_CONVERSION_ORACLE = f"""
WITH funnel AS ({_WINDOW_FUNNEL_CORE})
SELECT CAST(level AS INT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(COUNT(*)) OVER (ORDER BY level DESC) AS BIGINT) AS n_reached,
       SUM(COUNT(*)) OVER (ORDER BY level DESC) * 1.0
           / SUM(COUNT(*)) OVER () AS reach_rate
FROM (SELECT user_id, funnel_level AS level FROM funnel)
GROUP BY level
ORDER BY level
"""


@register("events_funnel_conversion", _FUNNEL_CONVERSION_ORACLE, extra=True)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's aggregate twin — the conversion table an analytics
    dashboard actually renders: per depth, how many users topped out there,
    how many reached AT LEAST that depth (a reverse-cumulative sum over the
    handful of level rows), and the reach rate over all scored users.

    Scale: composes ``events_window_funnel`` (one corpus-scale shuffle)
    with a rollup over at most len(steps)+1 rows — the cumulative window
    runs on that tiny aggregate, never on users.
    """
    from pyspark.sql import Window

    levels = events_window_funnel(spark, sf_dir).groupBy(
        F.col("funnel_level").alias("level")
    ).agg(F.count(F.lit(1)).alias("n_users"))
    w_cum = Window.orderBy(F.desc("level")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        levels.withColumn("n_reached", F.sum("n_users").over(w_cum))
        .withColumn("reach_rate", F.col("n_reached") * 1.0 / F.sum("n_users").over(w_all))
        .orderBy("level")
    )
