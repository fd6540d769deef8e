"""Event-analytics operators over the events stream table (SURVEY.md
§2.10, batch ``evt_*`` keys).  Their streaming twins live in
:mod:`engine.streaming`.

Time discipline: all arithmetic happens on integer epoch-microseconds
(``unix_micros``) — exact, no float intervals, no sub-second truncation
surprises; window starts are emitted as epoch seconds or date_trunc'd
timestamps identically on both engines.

100 TB notes: every key is one-or-two shuffles on (user_id) or the
window key; sessionization is the lag+cumsum idiom (linear state, no
self-join); the funnel is staged conditional-min joins that shuffle only
(user, stage-time) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.core import query
from engine.io import load

_US_PER_S = 1_000_000


@query(
    "evt_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's window() with a tumble equal to the slide aligns to the
    # epoch → window.start == date_trunc('hour') exactly.
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value_cents",
            "n_users",
        )
    )


@query(
    "evt_sliding_window",
    oracle="""
    SELECT (epoch_us(e.ts) // 900000000 - s.k) * 900 AS win_start_s,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e, (SELECT unnest(range(0, 4)) AS k) s
    GROUP BY 1
    """,
)
def evt_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour windows sliding 15 min: every event lands in exactly 4
    # epoch-aligned windows; the oracle phase-shifts the 15-min grid.
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / _US_PER_S).cast("long").alias("win_start_s"),
            "n",
            "n_users",
        )
    )


_GAP_US = 30 * 60 * _US_PER_S  # 30-minute session gap


@query(
    "evt_session_window",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id % 2 = 0
    ),
    sessions AS (
        SELECT user_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) AS BIGINT) AS end_us,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def evt_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum as session index → per-session aggregate.  One
    shuffle on user_id, linear per-user state — the batch twin of
    ``session_window`` in Structured Streaming.

    Sessionization is per-user, so the user-residue filter bounds the
    verified output without touching any session's semantics
    (engine/io.py note)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 2 == 0)
    us = F.unix_micros(F.col("ts"))
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(us - F.lag(us).over(w_order) > _GAP_US, 1).otherwise(0).alias("new_session"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w_cum)
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@query(
    "evt_session_native",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        >= {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE user_id % 2 = 0
    ),
    sessions AS (
        SELECT user_id, us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) + {_GAP_US} AS BIGINT) AS window_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def evt_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` in batch mode (VERDICT r2
    "missing" #3 noted only the lag+cumsum idiom was exercised).

    Dialect pin for the oracle twin: session_window merges an event into
    the open window iff ts < prev_end = prev_ts + gap, i.e. it SPLITS on
    gap >= 30 min (strict-less merge) — the lag+cumsum oracle therefore
    flags ``gap >= GAP`` (the batch idiom key evt_session_window uses
    ``gap > GAP``, a deliberate boundary difference).  The merged window
    end is last-event ts + gap.  Same user-residue output bound as
    evt_session_window.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 2 == 0)
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "n_events",
        )
    )


@query(
    "evt_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.s_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
        GROUP BY e.user_id
    )
    SELECT s.user_id,
           CAST(s.s_us AS BIGINT) AS s_us,
           CAST(c.c_us AS BIGINT) AS c_us,
           CAST(p.p_us AS BIGINT) AS p_us,
           CAST(1 + (c.c_us IS NOT NULL)::INT + (p.p_us IS NOT NULL)::INT AS INTEGER) AS stage
    FROM s LEFT JOIN c ON s.user_id = c.user_id
           LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→click→purchase funnel: each stage is the earliest
    qualifying event strictly after the previous stage's time.  Staged
    conditional-min joins — each stage shuffles only (user, time) pairs,
    never the full event payload."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("s_us"))
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("e_us"))
        .join(sign, "user_id")
        .filter(F.col("e_us") > F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("e_us").alias("c_us"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("e_us"))
        .join(click, "user_id")
        .filter(F.col("e_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("e_us").alias("p_us"))
    )
    return (
        sign.join(click, "user_id", "left")
        .join(purchase, "user_id", "left")
        .select(
            "user_id",
            "s_us",
            "c_us",
            "p_us",
            (
                F.lit(1)
                + F.col("c_us").isNotNull().cast("int")
                + F.col("p_us").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


@query(
    "evt_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_date,
           CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def evt_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Classic retention triangle: cohort = first-activity date, offset =
    # days since cohort, cell = distinct active users.
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_date")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_date")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "evt_rate_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS span_us,
           CAST(COUNT(*) AS DOUBLE) * 3600000000
               / NULLIF(MAX(epoch_us(ts)) - MIN(epoch_us(ts)), 0) AS events_per_hour,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(*)
               AS error_ratio
    FROM events
    GROUP BY user_id
    """,
)
def evt_rate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rates as single divisions of exact integers (NULL for single-event
    # users instead of a zero-span blowup).
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    span = F.max(us) - F.min(us)
    n = F.count("*")
    return ev.groupBy("user_id").agg(
        n.alias("n_events"),
        span.alias("span_us"),
        (n.cast("double") * 3_600_000_000 / F.nullif(span, F.lit(0))).alias("events_per_hour"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("double")
            / n
        ).alias("error_ratio"),
    )


@query(
    "evt_anomaly_mad",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc
        FROM events
    ),
    med AS (
        SELECT event_type, quantile_cont(vc, 0.5) AS med_cents
        FROM e GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, ABS(vc - med_cents) AS dev, med_cents
        FROM e JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad_cents
        FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN dev > 3 * mad_cents THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           MIN(d.med_cents) AS med_cents,
           MIN(mad.mad_cents) AS mad_cents
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def evt_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-segment outlier detection: median + MAD (median
    absolute deviation) of event value per event_type; an event is
    anomalous when |v − median| > 3·MAD.  Unlike mean/stddev, the
    estimator doesn't move when the outliers it hunts contaminate it.

    Hash-safety: values enter as exact integer cents, so both engines'
    percentile interpolation lands on exact quarter-integers (lo +
    (hi−lo)·0.5 over ints/half-ints) — med, MAD, and the 3·MAD
    comparison are bit-identical IEEE, never a rounding lottery.

    Scale design: two grouped exact percentiles + broadcast joins of the
    tiny per-type stats dim back onto the fact.  Exact percentile sorts
    within each type; at 100 TB swap `percentile` for
    `approx_percentile(…, 10000)` (documented accuracy knob) — the
    outlier COUNT tolerates a quantile within ±ε, the contract shape
    doesn't change."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    med = e.groupBy("event_type").agg(
        F.percentile("vc", 0.5).alias("med_cents")
    )
    withdev = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("vc") - F.col("med_cents"))
    )
    mad = withdev.groupBy("event_type").agg(
        F.percentile("dev", 0.5).alias("mad_cents")
    )
    return (
        withdev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.min("med_cents").alias("med_cents"),
            F.min("mad_cents").alias("mad_cents"),
        )
    )


@query(
    "evt_gap_fill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
        FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT g.event_type, g.hour,
           CASE WHEN h.n IS NULL THEN 0 ELSE 1 END AS observed,
           COALESCE(h.n, 0) AS n,
           last_value(h.cents IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cents_ffill
    FROM grid g
    LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
    """,
)
def evt_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: project each event_type onto a
    dense hourly grid between its first and last observed hour; empty
    hours appear with n=0 and carry the last observed hourly value
    forward (`last(..., ignorenulls)` — the FFILL of every time-series
    store).  `observed` flags real vs filled rows (int, not boolean —
    driver-safe scalar set).

    Scale design: the grid is generated from the per-type bounds dim
    (tiny — one row per type) via sequence+explode, so the dense grid
    never materializes driver-side; the left join hashes on (type,
    hour) against map-side-combined hourly partials, and the fill
    window partitions by type — at 100 TB the partition key becomes
    (type, week) with a seeded boundary row per partition, the standard
    distributed-ffill split."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        ),
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    joined = grid.join(hourly, ["event_type", "hour"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour",
        F.when(F.col("n").isNull(), 0).otherwise(1).alias("observed"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.last("cents", ignorenulls=True).over(w).alias("cents_ffill"),
    )


@query(
    "evt_rolling_distinct",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    spine AS (SELECT DISTINCT day FROM pairs)
    SELECT s.day,
           COUNT(DISTINCT CASE WHEN p.day = s.day THEN p.user_id END) AS dau,
           COUNT(DISTINCT p.user_id) AS wau7
    FROM spine s
    JOIN pairs p ON p.day BETWEEN s.day - 6 AND s.day
    GROUP BY s.day
    """,
)
def evt_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct users — DAU and trailing-7-day WAU per day.
    COUNT(DISTINCT) cannot ride a window range frame (distinct state
    isn't subtractable), so the engine uses the spine-join shape: the
    day spine joins every (day, user) pair within its trailing week,
    then one grouped dual count-distinct.

    Scale design: pre-distincting (day, user) first collapses the event
    stream to its per-day user sets BEFORE the 7× fan-out join — the
    join input is DAU-sized, not event-sized.  The spine side is tiny
    (one row per day) and broadcasts; at 100 TB the pairs side is
    bucketed by week so the band join stays co-partitioned (same recipe
    as join_range_band), or the exact distinct is swapped for mergeable
    HLL sketches (agg_hll_partitioned_merge) when ±2% error is fine."""
    # DATE on both sides — DuckDB's date_trunc('day', ts) yields DATE
    # while Spark's yields TIMESTAMP (dialect trap; see
    # engine/functions.py date notes), so the day grain is cast to DATE
    # explicitly in both engines.
    ev = load(spark, sf_dir, "events")
    pairs = ev.select(F.to_date(F.col("ts")).alias("day"), "user_id").distinct()
    spine = pairs.select("day").distinct().select(F.col("day").alias("s_day"))
    joined = pairs.join(
        F.broadcast(spine),
        (F.col("day") >= F.date_sub(F.col("s_day"), 6))
        & (F.col("day") <= F.col("s_day")),
    )
    return joined.groupBy(F.col("s_day").alias("day")).agg(
        F.countDistinct(
            F.when(F.col("day") == F.col("s_day"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct("user_id").alias("wau7"),
    )


@query(
    "evt_path_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n,
           CAST(FLOOR(10000.0 * COUNT(*) / SUM(COUNT(*)) OVER
               (PARTITION BY prev_type)) AS BIGINT) AS p_bp
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def evt_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: for each user's
    time-ordered event stream, count (previous event_type → next
    event_type) steps and normalize per source state to basis points —
    the Markov-chain input of funnel/attribution analytics.  Ordering
    ties break on event_id (unique), so the lag is deterministic on
    both engines.

    Scale design: one window (partitioned by user — millions of small
    partitions, no skew) feeding a grouped count whose output is
    |event_types|² rows; the per-source normalization rides a window
    over that tiny aggregate, not over the event stream."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("prev_type"))
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.floor(F.lit(10000.0) * F.col("n") / total).cast("long").alias("p_bp"),
    )


@query(
    "evt_scd2_history",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE user_id % 3 = 0
    ),
    ch AS (
        SELECT user_id, event_id, event_type, us,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) AS prev_type
        FROM e
    ),
    seg AS (
        SELECT user_id, event_type AS segment, us AS valid_from_us, event_id
        FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, segment, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, event_id)
               AS valid_to_us,
           CAST(CASE WHEN LEAD(valid_from_us) OVER (
                    PARTITION BY user_id ORDER BY valid_from_us, event_id)
                IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM seg
    """,
)
def evt_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    user's event stream into validity intervals of their current
    segment (= event_type here) — rows open at the event that changed
    the segment and close when the next change arrives; the open
    interval is flagged current.  This is the standard
    change-data-capture → dimension-table derivation.

    Scale design: both window passes (change detection via lag, close
    via lead) share ONE partitioning (user_id, ordered by time with the
    unique event_id tiebreak) — a single shuffle, two sort-free window
    frames over it; the change filter prunes the stream BEFORE the
    second pass.  Epoch-microsecond longs avoid engine timestamp-
    comparison drift.  Residue slice (user_id % 3) bounds verified
    output per the driver-budget rule."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 3 == 0)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    seg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("segment"),
            us.alias("valid_from_us"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    nxt = F.lead("valid_from_us").over(w2)
    return seg.select(
        "user_id",
        "segment",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )


@query(
    "evt_inactivity_churn",
    oracle="""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
    per_user AS (
        SELECT user_id, MAX(epoch_us(ts)) AS last_seen_us,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT p.user_id, p.last_seen_us, p.n_events,
           CAST(FLOOR((m.max_us - p.last_seen_us) / 86400000000.0)
                AS BIGINT) AS days_inactive,
           CAST(CASE WHEN (m.max_us - p.last_seen_us) >= 30 * 86400000000
                THEN 1 ELSE 0 END AS INTEGER) AS churned
    FROM per_user p, mx m
    """,
)
def evt_inactivity_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn detection by inactivity: each user's last-seen time, event
    count, whole days of inactivity relative to the corpus horizon, and
    a 30-day churn flag — the retention-ops complement of
    evt_retention_cohort (which measures who RETURNS; this measures who
    LEFT).

    Scale design: one map-side-combinable per-user aggregate; the
    corpus horizon is a 1-row aggregate broadcast into it (cross join
    of N×1 — no shuffle of the user side).  Exact integer microsecond
    arithmetic end-to-end; the day floor divides longs in IEEE double
    (identical on both engines)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per_user = ev.groupBy("user_id").agg(
        F.max(us).alias("last_seen_us"), F.count("*").alias("n_events")
    )
    mx = ev.agg(F.max(us).alias("max_us"))
    gap = F.col("max_us") - F.col("last_seen_us")
    return per_user.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "last_seen_us",
        "n_events",
        F.floor(gap / 86400000000.0).cast("long").alias("days_inactive"),
        F.when(gap >= 30 * 86400000000, 1).otherwise(0).cast("int").alias(
            "churned"
        ),
    )


@query(
    "evt_interpolate_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT event_type, unnest(range(h0, h1 + 1)) AS h FROM bounds
    ),
    j AS (
        SELECT g.event_type, g.h, hr.cents,
               CASE WHEN hr.cents IS NOT NULL THEN 1 ELSE 0 END AS observed,
               CASE WHEN hr.cents IS NOT NULL THEN g.h END AS obs_h
        FROM grid g LEFT JOIN hourly hr
          ON hr.event_type = g.event_type AND hr.h = g.h
    ),
    w AS (
        SELECT event_type, h, observed, cents,
               last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
               last_value(obs_h IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               first_value(cents IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
               first_value(obs_h IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM j
    )
    SELECT event_type, h AS hour_h, CAST(observed AS INTEGER) AS observed,
           FLOOR((CASE WHEN observed = 1 THEN CAST(cents AS DOUBLE)
                  ELSE pc + (nc - pc) * CAST(h - ph AS DOUBLE) / (nh - ph)
                  END) * 10000 + 0.5) / 10000 AS cents_interp
    FROM w
    """,
)
def evt_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps — the resample mode
    evt_gap_fill's forward-fill can't express: every empty hour gets
    the value on the straight line between its nearest observed
    neighbors (the pandas ``interpolate(method='linear')`` of the
    distributed world).

    Scale design: the dense grid comes from the per-type bounds dim
    (sequence+explode, never driver-side); FOUR ignore-nulls window
    reads (prev/next value and hour) share ONE (type, hour)
    partitioning — a single shuffle and sort serves both directions,
    the backward frame reading the same sorted runs.  Boundary rows
    are observed by construction, so every gap is interior and the
    lerp denominator is never zero.  All inputs are exact integers
    (cents, epoch-hours); the lerp divides exact-int doubles and
    fix4-pins — hash-safe on both engines."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.unix_seconds(F.date_trunc("hour", F.col("ts"))) / 3600)
        .cast("long")
        .alias("h"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h")
    )
    j = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        "cents",
        F.when(F.col("cents").isNotNull(), 1).otherwise(0).alias("observed"),
        F.when(F.col("cents").isNotNull(), F.col("h")).alias("obs_h"),
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pc = F.last("cents", ignorenulls=True).over(back)
    ph = F.last("obs_h", ignorenulls=True).over(back)
    nc = F.first("cents", ignorenulls=True).over(fwd)
    nh = F.first("obs_h", ignorenulls=True).over(fwd)
    lerp = pc + (nc - pc) * (F.col("h") - ph).cast("double") / (nh - ph)
    interp = F.when(F.col("observed") == 1, F.col("cents").cast("double")).otherwise(lerp)
    return j.select(
        "event_type",
        F.col("h").alias("hour_h"),
        F.col("observed").cast("int").alias("observed"),
        (F.floor(interp * 10000 + F.lit(0.5)) / 10000).alias("cents_interp"),
    )


@query(
    "evt_ab_lift",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents_a,
           CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents_b,
           CAST(FLOOR(10000.0
                * ((CAST(SUM(CASE WHEN user_id % 2 = 1
                         THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE)
                    / SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END))
                   / (CAST(SUM(CASE WHEN user_id % 2 = 0
                           THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
                      / SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)))
                + 0.5) AS BIGINT) AS lift_bp
    FROM events
    GROUP BY event_type
    """,
)
def evt_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into control (A) / treatment
    (B) by a deterministic id parity, per-event-type mean value compared
    as treatment-over-control lift in basis points — the
    experimentation-platform aggregate every product pipeline ships.

    Scale design: both arms are conditional partial sums inside ONE
    map-side-combinable aggregate over one scan — no per-arm subquery,
    no join of arm aggregates.  Means divide exact integer cents by
    exact counts; the lift ratio is written with the identical
    operation order on both engines, then floor-pinned."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_a = F.col("user_id") % 2 == 0
    n_a = F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a")
    n_b = F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b")
    cents_a = F.sum(F.when(is_a, cents).otherwise(F.lit(0))).alias("cents_a")
    cents_b = F.sum(F.when(~is_a, cents).otherwise(F.lit(0))).alias("cents_b")
    g = ev.groupBy("event_type").agg(n_a, n_b, cents_a, cents_b)
    mean_a = F.col("cents_a").cast("double") / F.col("n_a")
    mean_b = F.col("cents_b").cast("double") / F.col("n_b")
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        "cents_a",
        "cents_b",
        F.floor(10000.0 * (mean_b / mean_a) + F.lit(0.5))
        .cast("long")
        .alias("lift_bp"),
    )


@query(
    "evt_streaks",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn_all,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id) AS rn_type
        FROM events
    ),
    islands AS (
        SELECT user_id, event_type, rn_all - rn_type AS island,
               COUNT(*) AS streak
        FROM seq GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type,
           CAST(MAX(streak) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM islands GROUP BY user_id, event_type
    """,
)
def evt_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive same-type events per user — the
    gaps-and-islands pattern (row_number difference trick): two
    row_numbers over the SAME sort order differ by a constant within
    each run, so the difference is the island id and no self-join or
    iterative pass is needed.

    Scale design: both window passes and the island aggregate share the
    user partitioning — one shuffle; the rn-difference trick turns a
    sequential-scan problem into per-partition window arithmetic, which
    is why it survives 100 TB where a loop or self-join would not.
    Unique (ts, event_id) ordering makes islands deterministic."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w_all = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        us, F.col("event_id")
    )
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    islands = seq.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("streak")
    )
    return islands.groupBy("user_id", "event_type").agg(
        F.max("streak").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
    )


@query(
    "evt_pct_change",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour, cents,
           LAG(cents) OVER (PARTITION BY event_type ORDER BY hour)
               AS prev_cents,
           CAST(FLOOR(10000.0 * (cents - LAG(cents) OVER (
                    PARTITION BY event_type ORDER BY hour))
                / LAG(cents) OVER (PARTITION BY event_type ORDER BY hour)
                + 0.5) AS BIGINT) AS change_bp
    FROM hourly
    """,
)
def evt_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour percent change of each event type's value mass —
    the delta/trend primitive every metrics dashboard derives (NULL
    change on each series' first hour, exact basis points elsewhere).

    Scale design: hourly rollup is one map-side-combinable agg; the
    lag and the change expression share one (type, hour-ordered)
    window partitioning — one shuffle after the rollup.  cents are
    exact longs; the change ratio divides exact ints in IEEE double
    and floor-pins, so NULL/zero-denominator rows (none in this
    corpus: every observed hour has positive mass) and sign handling
    mirror exactly."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("cents").over(w)
    return hourly.select(
        "event_type",
        "hour",
        "cents",
        prev.alias("prev_cents"),
        F.floor(10000.0 * (F.col("cents") - prev) / prev + F.lit(0.5))
        .cast("long")
        .alias("change_bp"),
    )


@query(
    "evt_trigram_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id)
                   AS t1,
               LEAD(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id)
                   AS t2
        FROM events
    )
    SELECT event_type || '>' || t1 || '>' || t2 AS path,
           COUNT(*) AS cnt
    FROM seq WHERE t2 IS NOT NULL
    GROUP BY 1
    ORDER BY cnt DESC, path ASC
    LIMIT 10
    """,
)
def evt_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths across all user journeys — the
    3-step sequence-mining readout (what evt_path_transitions' 1st-order
    Markov matrix can't see: WHICH multi-step flows actually dominate).

    Scale design: both leads share one (user, time)-ordered window
    partitioning (single shuffle); path counting is map-side
    combinable at path-vocabulary cardinality, and the top-10 with the
    path tiebreak compiles to TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(F.col("t2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(10)
    )


@query(
    "evt_heatmap_dow_hour",
    oracle="""
    SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           COUNT(*) AS n,
           CAST(FLOOR(10000.0 * COUNT(*) / SUM(COUNT(*)) OVER () + 0.5)
                AS BIGINT) AS share_bp
    FROM events
    GROUP BY 1, 2
    """,
)
def evt_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity heatmap: event volume by (ISO day-of-week,
    hour-of-day) with each cell's share of total traffic — the
    seasonality profile capacity planning and anomaly baselines read.

    Scale design: one map-side-combinable agg collapses the stream to
    ≤168 cells; the share window runs over that constant-size frame.
    Spark's dayofweek() is 1=Sunday — weekday()+1 mirrors DuckDB's
    isodow (1=Monday), the fn_date_parts dialect pin."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy(F.lit(0)))
    return agg.select(
        "iso_dow",
        "hour_of_day",
        "n",
        F.floor(10000.0 * F.col("n") / total + F.lit(0.5))
        .cast("long")
        .alias("share_bp"),
    )


@query(
    "evt_session_dynamic_gap",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN event_type = 'purchase' THEN 3600000000
                    WHEN event_type IN ('click', 'view') THEN 900000000
                    ELSE 1800000000 END AS gap_us
        FROM events WHERE user_id % 4 = 1
    ),
    flagged AS (
        SELECT user_id, event_id, us, gap_us,
               CASE WHEN MAX(us + gap_us) OVER (
                        PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) > us THEN 0 ELSE 1 END AS new_session
        FROM ev
    ),
    sessions AS (
        SELECT user_id, us, gap_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us + gap_us) AS BIGINT) AS window_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def evt_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap sessionization — Spark's ``session_window`` with a
    per-event gap EXPRESSION (purchases hold a session open 60 min,
    clicks/views 15, the rest 30): the idle timeout that varies by
    event semantics, which fixed-gap sessionization can't express.

    Oracle subtlety: with heterogeneous gaps an earlier event can hold
    the session open LONGER than the immediately-previous one, so the
    boundary test is against the RUNNING MAX of window ends (us+gap)
    over all preceding events — not lag().  The global running max
    works because ends are monotone across session boundaries: any
    earlier session's max end precedes the current session's start.
    Merge is on interval OVERLAP (strict >), matching the native
    operator's exclusive window end.

    Scale design: the native operator and the oracle both ride ONE
    user-partitioned shuffle; session state merges executor-side (same
    operator the streaming key exercises statefully)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 1)
    gap = (
        F.when(F.col("event_type") == "purchase", "60 minutes")
        .when(F.col("event_type").isin("click", "view"), "15 minutes")
        .otherwise("30 minutes")
    )
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "n_events",
        )
    )


@query(
    "evt_attribution_last_touch",
    oracle="""
    WITH touches AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events WHERE event_type IN ('click', 'view')
    ),
    conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    attributed AS (
        SELECT c.conv_id, c.cents,
               (SELECT t.event_type FROM touches t
                WHERE t.user_id = c.user_id
                  AND (t.us < c.c_us
                       OR (t.us = c.c_us AND t.event_id < c.conv_id))
                  AND t.us > c.c_us - 86400000000
                ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS channel
        FROM conv c
    )
    SELECT COALESCE(channel, '(none)') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM attributed
    GROUP BY COALESCE(channel, '(none)')
    """,
)
def evt_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the marketing-analytics staple: each
    purchase credits the LAST click/view touch within a 24 h lookback;
    purchases with no prior touch report as '(none)'.  This is the
    grouped-as-of pattern (join_asof generalized with a channel
    dimension and a bounded lookback) — the oracle states it as a
    correlated LIMIT 1 subquery (with the same-microsecond tie broken
    lexicographically on (us, event_id), exactly the window's order —
    `us <=` alone would be a latent corpus-reroll lottery), the Spark
    plan as a union + window:
    interleave touches and conversions per user, last_value(touch)
    ignore-nulls over the ordered stream, bounded by the lookback check.

    Scale design: ONE user-partitioned window over the interleaved
    stream (no per-conversion probe, no range join blowup); the
    lookback filter is a residual on the carried touch timestamp.
    Unique (us, event_id) ordering removes ties."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        us.alias("us"),
        F.col("event_id").alias("eid"),
        F.col("event_type").alias("t_type"),
        F.lit(None).cast("long").alias("conv_id"),
        F.lit(None).cast("long").alias("cents"),
    )
    convs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("us"),
        F.col("event_id").alias("eid"),
        F.lit(None).cast("string").alias("t_type"),
        F.col("event_id").alias("conv_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    stream = touches.unionByName(convs)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = stream.select(
        "conv_id",
        "cents",
        "us",
        F.last("t_type", ignorenulls=True).over(w).alias("last_channel"),
        F.last(
            F.when(F.col("t_type").isNotNull(), F.col("us")), ignorenulls=True
        )
        .over(w)
        .alias("last_touch_us"),
    ).filter(F.col("conv_id").isNotNull())
    channel = F.when(
        F.col("last_touch_us").isNotNull()
        & (F.col("last_touch_us") > F.col("us") - 86_400_000_000),
        F.col("last_channel"),
    ).otherwise("(none)")
    return carried.select(channel.alias("channel"), "cents").groupBy(
        "channel"
    ).agg(
        F.count("*").alias("n_conversions"),
        F.sum("cents").alias("attributed_cents"),
    )


@query(
    "evt_growth_accounting",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    seq AS (
        SELECT user_id, day,
               LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
        FROM ud
    ),
    classified AS (
        SELECT day,
               CASE WHEN prev_day IS NULL THEN 'new'
                    WHEN day - prev_day = 1 THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM seq
    ),
    churn AS (
        SELECT day + 1 AS day, 'churned' AS status
        FROM seq s
        WHERE NOT EXISTS (
            SELECT 1 FROM ud u
            WHERE u.user_id = s.user_id AND u.day = s.day + 1
        )
          AND day + 1 <= (SELECT MAX(day) FROM ud)
    )
    SELECT day, status, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT * FROM classified UNION ALL SELECT * FROM churn)
    GROUP BY day, status
    """,
)
def evt_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the DAU decomposition every growth team
    reports: each active (user, day) is NEW (first ever day), RETAINED
    (also active the previous day), or RESURRECTED (returning after a
    gap); each inactive day following an active one is a CHURNED event
    attributed to the day the user went missing (bounded by the corpus
    horizon so the last day doesn't churn everyone).

    Scale design: the distinct (user, day) grid is one shuffle; the
    classification is a single lag window over it; churn is the lead
    side of the SAME window (no second scan, no NOT-EXISTS probe — the
    oracle's anti-join form is the declarative equivalent).  Output is
    (days × 4) rows regardless of corpus size."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = ud.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.lead("day").over(w).alias("next_day"),
    )
    status = (
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.datediff("day", F.col("prev_day")) == 1, "retained")
        .otherwise("resurrected")
    )
    classified = seq.select("day", status.alias("status"))
    horizon = ud.agg(F.max("day").alias("max_day"))
    churn = (
        seq.filter(
            F.col("next_day").isNull()
            | (F.datediff("next_day", F.col("day")) > 1)
        )
        .select(F.date_add("day", 1).alias("day"))
        .join(F.broadcast(horizon))
        .filter(F.col("day") <= F.col("max_day"))
        .select("day", F.lit("churned").alias("status"))
    )
    return (
        classified.unionByName(churn)
        .groupBy("day", "status")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "evt_lateness_audit",
    oracle="""
    WITH seen AS (
        SELECT event_type, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS high_water
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN us < high_water THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN us < high_water
                                  THEN (high_water - us) // 1000000 END), 0)
                AS BIGINT) AS max_lateness_s
    FROM seen
    GROUP BY event_type
    """,
)
def evt_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit — the BATCH diagnostic that sizes a
    streaming watermark: treating event_id as arrival order, how many
    events arrive with a timestamp BEHIND their user's high-water mark,
    and how far behind?  ``max_lateness_s`` is exactly the number a
    deployment reads before choosing ``withWatermark`` lag (the
    streaming keys here use 1 hour; this key justifies such a choice
    from data).

    Semantics: high-water = running max of event time over arrival
    order per user, EXCLUDING the current row (rows between unbounded
    preceding and 1 preceding) — a row equal to the max is on time,
    strictly behind is late.  All arithmetic is exact integer
    microseconds (``unix_micros`` / ``epoch_us``), lateness floored to
    whole seconds with integer division on both engines.

    Scale: one shuffle on user_id (state bounded per user), then a
    map-side-combinable 3-column aggregate; no second shuffle beyond
    the tiny per-type reduce."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seen = ev.select(
        "event_type",
        us.alias("us"),
        F.max(us).over(w).alias("high_water"),
    )
    late = F.col("us") < F.col("high_water")
    return seen.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
        F.coalesce(
            F.max(
                F.when(
                    late,
                    F.expr("(high_water - us) div 1000000"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("max_lateness_s"),
    )


@query(
    "evt_cumulative_reach",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily
    """,
)
def evt_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE REACH — running count of distinct users ever seen, by
    day: the audience-growth curve every product dashboard opens with,
    and the exact-distinct companion to the growth-accounting
    decomposition (``evt_growth_accounting`` classifies day-over-day
    state transitions; this key gives the monotone total).

    Plan: distinct-user reach needs each user counted once at FIRST
    appearance — min(day) per user (one shuffle on user_id), a daily
    count (bounded: one row per calendar day), then a running sum over
    the day sequence.  The final window is unpartitioned BUT its input
    is the daily rollup — one row per day by construction (same bounded
    class as win_moving_avg's allow-list entry) — never the event
    stream.  Counting DISTINCT users per cumulative prefix directly
    would be quadratic; first-seen conversion makes reach a plain
    running sum of an additive measure.

    Scale: two map-side-combinable aggregations + an O(days) window;
    merges across segments by summing first-seen counts."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    daily = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@query(
    "evt_bot_regularity",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap
        FROM events
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(SUM(CAST(gap AS HUGEINT)) AS DOUBLE) AS s1,
               CAST(SUM(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT))
                    AS DOUBLE) AS s2
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap) >= 20
    )
    SELECT user_id, n_gaps,
           CAST(FLOOR(s1 / n_gaps / 1000000 + 0.5) AS BIGINT) AS mean_gap_s,
           -- GREATEST(var, 0): near-constant gaps (exactly the bot
           -- pattern) cancel s2/n - m*m to a tiny NEGATIVE double, and
           -- DuckDB SQRT hard-errors on negatives (Spark yields NaN)
           CAST(FLOOR(SQRT(GREATEST(s2 / n_gaps
                                    - (s1 / n_gaps) * (s1 / n_gaps), 0))
                      / (s1 / n_gaps) * 10000 + 0.5) AS BIGINT) AS cv_e4,
           CAST(FLOOR(SQRT(GREATEST(s2 / n_gaps
                                    - (s1 / n_gaps) * (s1 / n_gaps), 0))
                      / (s1 / n_gaps) * 10000 + 0.5) < 2500 AS INTEGER)
               AS is_regular
    FROM s
    """,
)
def evt_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT / AUTOMATION detection by inter-event regularity — the
    data-cleaning pass a pipeline runs before events feed anything
    downstream: humans produce bursty gaps (coefficient of variation
    ≈ 1 for Poisson-ish arrivals), schedulers produce near-constant
    gaps (CV → 0), so a low CV over enough events flags automation.

    Exactness: gap sufficient statistics (Σg, Σg²) accumulate as
    decimal(38,0)/HUGEINT — a day-scale gap is ~10¹¹ µs, its square
    ~10²² overflows int64 — and the float CV math runs once per user on
    the exact sums in identical operation order, then e4-pins (the
    agg_exact_moments discipline).  The flag threshold compares the
    PINNED integer, so the cut is engine-exact.

    Scale: one shuffle on user_id shared by the lag window and the
    aggregate; sufficient statistics merge across time segments."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    gap = (us - F.lag(us).over(w)).alias("gap")
    dec = "decimal(38,0)"
    s = (
        ev.select("user_id", gap)
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum(F.col("gap").cast(dec)).cast("double").alias("s1"),
            F.sum((F.col("gap").cast(dec) * F.col("gap").cast(dec)))
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n_gaps") >= 20)
    )
    m = F.col("s1") / F.col("n_gaps")
    cv_e4 = F.floor(
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n_gaps") - m * m, F.lit(0.0)
            )
        )
        / m
        * 10000
        + F.lit(0.5)
    ).cast("long")
    return s.select(
        "user_id",
        "n_gaps",
        F.floor(m / 1_000_000 + F.lit(0.5)).cast("long").alias("mean_gap_s"),
        cv_e4.alias("cv_e4"),
        (cv_e4 < 2500).cast("int").alias("is_regular"),
    )


@query(
    "evt_ewma_integer",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id % 5 = 0
    ),
    ew AS (
        SELECT user_id, event_id, rn, c AS e FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.event_id, b.rn, (15 * b.c + 85 * ew.e) // 100
        FROM base b JOIN ew ON b.user_id = ew.user_id AND b.rn = ew.rn + 1
    )
    SELECT user_id, event_id, CAST(e AS BIGINT) AS ewma_cents FROM ew
    """,
)
def evt_ewma_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user stream, exact:
    e_1 = x_1; e_t = (15·x_t + 85·e_{t−1}) div 100 over integer cents
    (α = 0.15).  A TRUE recursion — each value depends on the previous
    OUTPUT, which no window frame can express — so the engine side is
    the canonical group-local-state pattern (applyInPandas: sort the
    user's stream, fold in exact Python ints) and the oracle is a
    RECURSIVE CTE stepping rn → rn+1.  The pair demonstrates both
    engines' only honest encodings of linear recurrences agree bit
    for bit when the arithmetic is pinned.

    Integer-division dialect trap (measured): DuckDB ``//`` TRUNCATES
    toward zero (-7 // 2 = -3) while Python ``//`` FLOORS (-4) — so
    the fold truncates explicitly (sign-split) instead of relying on
    event values staying positive across corpus rolls.  user_id
    modulo filter bounds
    verified rows (budget rule; EWMA depends only on the user's own
    stream, so pre-filtering users is semantics-preserving).

    Scale: ONE shuffle on user_id serves both the rn window and the
    grouped fold (subset-partitioning rule); per-group state is O(1)
    (the fold carries a single integer), group size = events-per-user
    — the applyInPandas batch never exceeds a user's stream.  The
    ordering RANK is computed JVM-side and only integers cross the
    Arrow boundary: shipping the raw timestamp into pandas measured
    2.36 s vs 0.99 s warm at sf0.1 (timestamp columns are the
    expensive Arrow conversion; rank-then-drop is the fix).  The
    streaming twin of this fold is applyInPandasWithState
    (stream_stateful_counter's harness) with e as the state row."""
    import pandas as pd

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id") % 5 == 0
    ).select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        F.row_number().over(w).alias("rn"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        out = []
        state = None
        for c in pdf["c"].astype("int64"):
            if state is None:
                state = int(c)
            else:
                t = 15 * int(c) + 85 * state
                # truncate toward zero like DuckDB's `//` (Python's //
                # FLOORS; they differ on negative states — latent while
                # event values are positive, but the corpus regenerates
                # between rounds)
                state = -((-t) // 100) if t < 0 else t // 100
            out.append(state)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ewma_cents": pd.array(out, dtype="int64"),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        fold, "user_id long, event_id long, ewma_cents long"
    )


_FUNNEL_WINDOW_US = 3_600_000_000  # 1 hour conversion window


@query(
    "evt_funnel_windowed",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events
    ),
    nxt AS (
        SELECT user_id, event_id, event_type, us,
               MIN(CASE WHEN event_type = 'purchase' THEN us END)
                   OVER (PARTITION BY user_id
                         ORDER BY us DESC, event_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS npt
        FROM e
    ),
    s AS (
        SELECT user_id, us, npt,
               CASE WHEN npt IS NOT NULL
                         AND npt - us <= 3600000000 THEN 1 ELSE 0 END AS conv,
               CASE WHEN npt IS NOT NULL
                         AND npt - us <= 3600000000 THEN npt - us END AS lag_us
        FROM nxt WHERE event_type = 'signup'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           CAST(MIN(lag_us) AS BIGINT) AS fastest_lag_us
    FROM s GROUP BY user_id
    """,
)
def evt_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict TIME-WINDOW funnel (signup → purchase within 1 hour) for
    EVERY signup event, not just the user's first — the
    time-to-convert metric evt_funnel's staged earliest-match cannot
    express.  The "next purchase after this event" lookup is a
    REVERSED running min: order the user's stream DESCENDING and take
    min(purchase ts) over the frame ENDING 1 PRECEDING — i.e. every
    event strictly later in stream order — turning a per-signup
    point-lookup self-join into one window pass.  Stream order is the
    total (us, event_id), so same-microsecond ties resolve identically
    on both engines (row frames are order-dependent; the unique
    event_id makes the order total — the repo's ORDER-BY-ends-in-a-
    unique-key rule applied to a frame).

    Exactness: all arithmetic in integer microseconds (unix_micros ↔
    epoch_us); the 1-hour bound and conversion lags are BIGINT
    everywhere.

    Scale: ONE shuffle on user_id serves the window and (subset rule)
    the per-user rollup; no self-join, no range join — the classic
    funnel anti-pattern (events ⋈ events on user + time band) never
    appears, so cost is linear in the stream, not quadratic in events
    per user."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("us"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    npt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("us"))
    ).over(w)
    nxt = e.select("user_id", "event_type", "us", npt.alias("npt"))
    conv = F.when(
        F.col("npt").isNotNull()
        & (F.col("npt") - F.col("us") <= F.lit(_FUNNEL_WINDOW_US)),
        1,
    ).otherwise(0)
    lag = F.when(conv == 1, F.col("npt") - F.col("us"))
    return (
        nxt.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_signups"),
            F.sum(conv).alias("n_converted"),
            F.min(lag).alias("fastest_lag_us"),
        )
    )


@query(
    "evt_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events
        GROUP BY 1, 2
    ),
    kd AS (
        SELECT *,
               SUM(x) OVER (PARTITION BY event_type)
                 // COUNT(*) OVER (PARTITION BY event_type) AS k
        FROM daily
    ),
    p AS (
        SELECT event_type, day, x, k,
               SUM(x - k) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS pref
        FROM kd
    )
    SELECT event_type, day, x,
           CAST(pref - LEAST(0, MIN(pref) OVER (PARTITION BY event_type
                                                ORDER BY day
                                                ROWS UNBOUNDED PRECEDING))
                AS BIGINT) AS cusum,
           CAST(CASE WHEN pref - LEAST(0, MIN(pref) OVER (
                         PARTITION BY event_type ORDER BY day
                         ROWS UNBOUNDED PRECEDING)) > 2 * k
                     THEN 1 ELSE 0 END AS INTEGER) AS alarm
    FROM p
    """,
)
def evt_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection on per-type daily event volume — the
    drift alarm a pipeline runs on its ingest monitors (Page's
    cumulative-sum control chart, positive side, drift allowance k =
    the series' integer mean).

    The defining recurrence s_i = max(0, s_{i-1} + (x_i - k)) looks
    iterative, but the closed form s_i = pref_i - min(0, min_{j<=i}
    pref_j) (prefix sum minus its running minimum) turns it into TWO
    ORDERED WINDOW PASSES over the same partitioning — no applyInPandas
    fold, no recursion, exact integers end-to-end.  The oracle computes
    the identical identity in SQL, hash-proving the rewrite.

    Scale: the daily rollup is one combinable shuffle of the raw
    stream; both ordered windows and the per-type mean window reuse the
    single (event_type) partitioning — one exchange carries
    calendar-bounded rows per type, never raw events.  (Day gaps, if
    any, contribute no term — CUSUM over observed buckets.)"""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("x"))
    kd = daily.select(
        "event_type",
        "day",
        "x",
        F.expr(
            "sum(x) over (partition by event_type)"
            " div count(*) over (partition by event_type)"
        ).alias("k"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = kd.select(
        "event_type",
        "day",
        "x",
        "k",
        F.sum(F.col("x") - F.col("k")).over(wo).alias("pref"),
    )
    cusum = F.col("pref") - F.least(
        F.lit(0).cast("long"), F.min("pref").over(wo)
    )
    return p.select(
        "event_type",
        "day",
        "x",
        cusum.alias("cusum"),
        (cusum > 2 * F.col("k")).cast("int").alias("alarm"),
    )


@query(
    "evt_decayed_engagement",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                    * (1048576 >> CAST(LEAST(
                          GREATEST(0, date_diff('day', CAST(ts AS DATE),
                                    DATE '2024-01-31')) // 7,
                          20) AS INTEGER))) AS BIGINT) AS score_q20
    FROM events
    GROUP BY user_id
    """,
)
def evt_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAYED engagement score (half-life 7 days): each event's
    value decays by 2^-(age/7d) toward the corpus horizon — the
    recency-weighted feature behind user activity ranking and
    retention models.  The decay is EXACT integer arithmetic: whole
    half-life periods become a RIGHT SHIFT of the Q20 fixed-point unit
    (1048576 >> periods), so no exp()/pow() — libm exponentials are
    not bit-identical across engines, shifts are — and the score is a
    plain integer sum (cents ≤ 5e4 × 2^20 × 2e3 events ≪ 2^63).
    Period count capped at 20 (a >= 63-bit shift is engine-defined).

    Scale: one combinable groupBy(user_id) shuffle; the decay weight
    is per-row map-side arithmetic.  The whole-period quantization
    (floor to 7-day steps) is the price of exactness — production
    smooths it by shrinking the step, not by switching to float
    exp."""
    e = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    # F.shiftright takes a literal bit count — a Column shift needs the
    # SQL form
    weighted = e.select(
        "user_id",
        cents.alias("cents"),
        # Clamp the day count at 0 BEFORE the division: for events past
        # the horizon, DuckDB's // floors the negative count (-1 → a
        # negative, engine-defined shift) while Spark's div truncates
        # to 0.  GREATEST/greatest makes both sides shift by 0 instead.
        F.least(
            F.expr(
                "GREATEST(CAST(0 AS BIGINT),"
                " CAST(datediff(DATE '2024-01-31', CAST(ts AS DATE))"
                " AS BIGINT)) div 7"
            ),
            F.lit(20).cast("long"),
        ).alias("p"),
    ).select(
        "user_id",
        (
            F.col("cents")
            * F.expr("shiftright(CAST(1048576 AS BIGINT), CAST(p AS INT))")
        ).alias("contrib"),
    )
    return weighted.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("contrib").alias("score_q20"),
    )


@query(
    "evt_srm_check",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n, n_a,
           CAST(FLOOR((2 * n_a - n) / sqrt(CAST(n AS DOUBLE)) * 1000000
                      + 0.5) AS BIGINT) AS z_e6,
           CAST(CASE WHEN ABS((2 * n_a - n) / sqrt(CAST(n AS DOUBLE)))
                          > 3.0
                     THEN 1 ELSE 0 END AS INTEGER) AS srm_alarm
    FROM g
    """,
)
def evt_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH check (the first thing an experimentation
    platform validates before reading an A/B result): for the user_id
    parity split, the per-event-type binomial z-score
    z = (2·n_a − n)/√n against the expected 50/50 allocation; |z| > 3
    raises the SRM alarm that invalidates the experiment.

    Determinism note: unlike sin/cos/exp, IEEE-754 REQUIRES sqrt to be
    correctly rounded — so (2·n_a − n) (exact integer < 2^53) divided
    by sqrt(n) is bit-identical across engines, and the e6 pinning is
    belt-and-suspenders, not load-bearing (contrast fn_geo_haversine's
    libm-trig residual risk).

    Scale: one combinable groupBy — counts only, no per-user state."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)
        ).alias("n_a"),
    )
    z = (2 * F.col("n_a") - F.col("n")) / F.sqrt(F.col("n").cast("double"))
    return g.select(
        "event_type",
        "n",
        "n_a",
        F.floor(z * 1000000 + F.lit(0.5)).cast("long").alias("z_e6"),
        (F.abs(z) > 3.0).cast("int").alias("srm_alarm"),
    )


@query(
    "evt_rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              DATE '2001-12-31') AS BIGINT) AS r_days,
               CAST(COUNT(*) AS BIGINT)                     AS f_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)                              AS m_cents
        FROM orders
        GROUP BY o_custkey
    )
    SELECT o_custkey, r_days, f_orders, m_cents,
           CAST(NTILE(5) OVER (ORDER BY r_days ASC,  o_custkey) AS BIGINT)
               AS r_score,
           CAST(NTILE(5) OVER (ORDER BY f_orders DESC, o_custkey) AS BIGINT)
               AS f_score,
           CAST(NTILE(5) OVER (ORDER BY m_cents DESC, o_custkey) AS BIGINT)
               AS m_score
    FROM rfm
    """,
)
def evt_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic customer-value triage (recency /
    frequency / monetary) every commerce warehouse derives: per
    customer, days since last order (vs a fixed reference date so the
    result is corpus-stable), order count, lifetime cents; each metric
    quintile-scored with NTILE(5) (score 1 = best: most recent, most
    frequent, highest spend).  Every NTILE order ends in the unique
    custkey (the engine's determinism rule — ntile over a non-unique
    order is layout-dependent).

    Scale: one groupBy(custkey) shuffle builds the RFM base; the three
    ntile windows share ONE global-sort partition each over the
    customer-cardinality frame (1/1000th of orders) — at 100 TB you'd
    replace exact ntile with percentile-bucket joins from
    approx-quantile cutpoints (agg_approx_quantile family) to avoid the
    single-partition sort; the exact form here is the oracle-provable
    contract."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-12-31").cast("date"),
            F.max("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("r_days"),
        F.count("*").alias("f_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("m_cents"),
    )
    return rfm.select(
        "o_custkey",
        "r_days",
        "f_orders",
        "m_cents",
        F.ntile(5)
        .over(Window.orderBy(F.asc("r_days"), F.asc("o_custkey")))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("f_orders"), F.asc("o_custkey")))
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("m_cents"), F.asc("o_custkey")))
        .cast("long")
        .alias("m_score"),
    )


@query(
    "evt_autocorr_daily",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    pairs AS (
        SELECT event_type, cnt AS x,
               LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS y
        FROM daily
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)      AS n,
               CAST(SUM(x) AS BIGINT)        AS sx,
               CAST(SUM(y) AS BIGINT)        AS sy,
               CAST(SUM(x * y) AS BIGINT)    AS sxy,
               CAST(SUM(x * x) AS BIGINT)    AS sxx,
               CAST(SUM(y * y) AS BIGINT)    AS syy
        FROM pairs WHERE y IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n, sx, sy, sxy, sxx, syy,
           CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy) > 0
                THEN FLOOR(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                       / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                              * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)))
                      * 1000000 + 0.5) / 1000000
                ELSE NULL END AS acf1_e6
    FROM m
    """,
)
def evt_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-1 AUTOCORRELATION of the daily event-count series per event
    type — the first diagnostic of every time-series workflow (is
    today's traffic predicted by yesterday's, or is the series white
    noise?).  Three stages: (1) the corpus-scale work, one combinable
    groupBy to the per-(type, day) rollup; (2) LAG over the BOUNDED
    rollup (|types|·|days| rows — the window is partitioned by type,
    no global sort); (3) Pearson r between the series and its shift
    from six exact integer moments, assembled in one identical double
    expression floor-pinned e6.

    Uses the paired-observation ACF convention (moments of the n−1
    overlapping (x_t, x_{t−1}) pairs), not the population-mean
    variant — stated so the number is interpretable.

    Scale: stage-1 output is DOMAIN-sized (days × types), so stages
    2-3 cost nothing at any sf; the exact integer counts keep every
    moment < 2^63 through sf1e4 (counts ≤ 4e8/day·type → Σx² ≤
    1.6e17·days ... safe; beyond, center on the series mean)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.select(
        "event_type",
        F.col("cnt").alias("x"),
        F.lag("cnt").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    m = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    )
    # Guard the variance product BEFORE the sqrt/divide: a constant (or
    # 2-day) series gives den = 0 → 0/0 = NaN, and Spark's
    # floor(double)->long maps NaN to 0 while DuckDB FLOOR propagates
    # it — the engines would silently diverge on degenerate data.  NULL
    # (mirrored CASE in the oracle) is also the honest answer: ACF of a
    # constant series is undefined.
    den_sq = (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    ) * (
        F.col("n") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select(
        "event_type", "n", "sx", "sy", "sxy", "sxx", "syy",
        F.when(
            den_sq > 0,
            F.floor((num / F.sqrt(den_sq)) * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("acf1_e6"),
    )


@query(
    "evt_diff_in_diff",
    oracle="""
    WITH cells AS (
        SELECT CAST(COUNT(*) FILTER (user_id % 2 = 0 AND ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS n_tp,
               CAST(COUNT(*) FILTER (user_id % 2 = 0 AND ts <  TIMESTAMP '2024-01-16') AS BIGINT) AS n_tb,
               CAST(COUNT(*) FILTER (user_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS n_cp,
               CAST(COUNT(*) FILTER (user_id % 2 = 1 AND ts <  TIMESTAMP '2024-01-16') AS BIGINT) AS n_cb,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    FILTER (user_id % 2 = 0 AND ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS s_tp,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    FILTER (user_id % 2 = 0 AND ts <  TIMESTAMP '2024-01-16') AS BIGINT) AS s_tb,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    FILTER (user_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS s_cp,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    FILTER (user_id % 2 = 1 AND ts <  TIMESTAMP '2024-01-16') AS BIGINT) AS s_cb
        FROM events
    )
    SELECT n_tp, n_tb, n_cp, n_cb, s_tp, s_tb, s_cp, s_cb,
           FLOOR((CAST(s_tp AS DOUBLE) / n_tp - CAST(s_tb AS DOUBLE) / n_tb
                  - (CAST(s_cp AS DOUBLE) / n_cp - CAST(s_cb AS DOUBLE) / n_cb))
                 * 10000 + 0.5) / 10000 AS did_cents_e4
    FROM cells
    """,
)
def evt_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the workhorse causal estimator for
    a staggered rollout: (treated post − treated pre) − (control post
    − control pre) of mean event value, which nets out both the
    group's level difference and the secular time trend.  Treatment
    assignment is the deterministic user-id parity split (the same
    hash-split family as `split_train_holdout`); the policy cutoff is
    mid-corpus so both periods are populated.

    The whole 2×2 design computes in ONE conditional-aggregate scan —
    eight exact integer cells (count + cents-sum per quadrant) cross
    the shuffle as combinable BIGINTs, then the estimate assembles in
    a single identical double expression (floor-pinned e4 cents).  No
    self-join, no four passes.

    Scale: map-side combine to 8 numbers — the cheapest possible
    plan; the same shape extends to per-cohort DiD by adding the
    cohort key to a groupBy."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    cut = F.lit("2024-01-16").cast("timestamp")
    treat = F.col("user_id") % 2 == 0
    post = F.col("ts") >= cut
    base = ev.select(
        cents.alias("cents"), treat.alias("t"), post.alias("p")
    )
    quad = {
        "tp": F.col("t") & F.col("p"),
        "tb": F.col("t") & ~F.col("p"),
        "cp": ~F.col("t") & F.col("p"),
        "cb": ~F.col("t") & ~F.col("p"),
    }
    cells = base.agg(
        *[F.count(F.when(c, 1)).alias(f"n_{k}") for k, c in quad.items()],
        *[F.sum(F.when(c, F.col("cents"))).alias(f"s_{k}")
          for k, c in quad.items()],
    )
    mean = lambda k: F.col(f"s_{k}").cast("double") / F.col(f"n_{k}")  # noqa: E731
    did = mean("tp") - mean("tb") - (mean("cp") - mean("cb"))
    return cells.select(
        "n_tp", "n_tb", "n_cp", "n_cb", "s_tp", "s_tb", "s_cp", "s_cb",
        (F.floor(did * 10000 + F.lit(0.5)) / 10000).alias("did_cents_e4"),
    )


@query(
    "evt_max_concurrency",
    oracle="""
    WITH sess AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               MIN(epoch_us(ts)) AS t_start,
               MAX(epoch_us(ts)) AS t_end
        FROM events
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT day, t_start AS t, CAST(1 AS BIGINT) AS delta FROM sess
        UNION ALL
        SELECT day, t_end AS t, CAST(-1 AS BIGINT) AS delta FROM sess
    ),
    swept AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC)
                   AS active
        FROM bounds
    )
    SELECT s.day,
           CAST(n.n_sessions AS BIGINT) AS n_sessions,
           CAST(MAX(s.active) AS BIGINT) AS max_concurrent
    FROM swept s
    JOIN (SELECT day, COUNT(*) AS n_sessions FROM sess GROUP BY day) n
      USING (day)
    GROUP BY s.day, n.n_sessions
    """,
)
def evt_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep line — the capacity-planning query
    ("how many sessions were active AT ONCE?") that a naive
    interval×interval self-join answers quadratically and the sweep
    answers in one sort: each user-day session [min ts, max ts]
    contributes a +1 boundary at start and a −1 at end; the running
    sum of deltas in boundary order is the live-session count, and its
    per-day MAX is the peak.

    Tie discipline (the correctness subtlety): ends are INCLUSIVE — a
    session ending at t overlaps one starting at t — so boundaries
    order by (t, delta DESC): +1s apply before −1s at the same
    instant.  Both engines' default ordered-window frame is RANGE
    (peers aggregate together), so equal-(t, delta) rows see identical
    running sums and the hash matches without a unique tiebreak.

    Scale: one groupBy(user, day) builds intervals (map-side
    combinable); the sweep is a window PARTITIONED BY DAY — per-day
    local sorts of 2·sessions boundary rows, never a global sort — and
    the final per-day MAX rides the same day partitioning (subset
    rule: no third exchange).  At 100 TB the same plan holds: shuffle
    volume is two small rows per session, not events."""
    ev = load(spark, sf_dir, "events")
    # Diamond: `sess` feeds the two boundary branches AND the per-day
    # session count — unpersisted, the events scan + groupBy would
    # re-derive 3× (measured 3 scans / 6 exchanges).  The persisted
    # frame is the AGGREGATED interval table (sessions, not events).
    sess = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.unix_micros(F.min("ts")).alias("t_start"),
        F.unix_micros(F.max("ts")).alias("t_end"),
    ).persist()
    bounds = sess.select(
        "day", F.col("t_start").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        sess.select(
            "day", F.col("t_end").alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    w = Window.partitionBy("day").orderBy(F.col("t"), F.col("delta").desc())
    swept = bounds.select(
        "day", F.sum("delta").over(w).alias("active")
    )
    per_day = swept.groupBy("day").agg(
        F.max("active").alias("max_concurrent")
    )
    n_sess = sess.groupBy("day").agg(F.count("*").alias("n_sessions"))
    return per_day.join(n_sess, "day").select(
        "day", "n_sessions", "max_concurrent"
    )


@query(
    "evt_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT a.event_type,
               a.cents AS actual,
               f.cents AS forecast
        FROM daily a
        JOIN daily f
          ON f.event_type = a.event_type AND f.day = a.day - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS sum_abs_err_cents,
           CAST(FLOOR(SUM(ABS(actual - forecast))
                      / CAST(COUNT(*) AS DOUBLE) * 100 + 0.5) AS BIGINT)
               AS mae_cents_e2
    FROM scored
    GROUP BY event_type
    """,
)
def evt_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    system must beat, and the shape every "did the model help?"
    evaluation takes: predict each day's revenue as the value seven
    days earlier and score MAE over all days with a week-old
    predecessor.  The lag is a DATE-KEYED SELF-JOIN (day − 7), not a
    LAG(7 rows) window: a gap day would silently misalign a row-offset
    lag while the join stays calendar-correct — the backtest bug class
    this key documents.

    Exact-integer discipline: daily revenue is exact cents, the error
    sum is exact long arithmetic, and only the final MAE does one
    IEEE division, floor-pinned to e2.

    Scale: the daily rollup is map-side combinable (days·types cells);
    the self-join runs on the AGGREGATED frame (≈ types×days rows, not
    events) and co-partitions on event_type — at 100 TB the join input
    is still only the cell table."""
    ev = load(spark, sf_dir, "events")
    # Diamond: `daily` is both join sides — persist the aggregated cell
    # table (types×days rows) so the events scan + rollup runs once.
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    ).persist()
    actual = daily.select(
        "event_type", "day", F.col("cents").alias("actual")
    )
    forecast = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("cents").alias("forecast"),
    )
    scored = actual.join(forecast, ["event_type", "day"])
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days_scored"),
        F.sum(F.abs(F.col("actual") - F.col("forecast"))).alias(
            "sum_abs_err_cents"
        ),
        F.floor(
            F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast("double")
            / F.count("*")
            * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mae_cents_e2"),
    )


@query(
    "evt_xcorr_lagged",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    ),
    x AS (SELECT day, c FROM daily WHERE event_type = 'click'),
    y AS (SELECT day, c FROM daily WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(range AS INT) AS lag FROM range(7)),
    p AS (
        SELECT l.lag, x.c AS xv, y.c AS yv
        FROM x CROSS JOIN lags l JOIN y ON y.day = x.day + l.lag
    ),
    s AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
               CAST(SUM(xv * xv) AS BIGINT) AS sxx,
               CAST(SUM(yv * yv) AS BIGINT) AS syy,
               CAST(SUM(xv * yv) AS BIGINT) AS sxy
        FROM p GROUP BY lag
    )
    SELECT lag, n,
           CASE WHEN SQRT(((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * sx))
                      * ((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy))) > 0
           THEN CAST(FLOOR(
               ((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy))
               / SQRT(((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * sx))
                      * ((CAST(n AS DOUBLE) * syy) - (CAST(sy AS DOUBLE) * sy)))
               * 10000 + 0.5) AS BIGINT) END AS xcorr_e4
    FROM s ORDER BY lag
    """,
)
def evt_xcorr_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two event streams' daily volumes
    (does `click` activity LEAD `purchase` activity by k days?) — the
    lead-lag diagnostic behind marketing attribution and capacity
    forecasting.  corr(x_t, y_{t+lag}) for lag 0..6.

    Exactness: the daily counts are exact integers, so all six power
    sums per lag are exact BIGINTs (order-independent) and the closing
    Pearson formula is one fixed IEEE sequence — the `agg_corr_exact`
    sufficient-statistics discipline — floor-pinned e4.

    Scale shape: events reduce to |types|x|days| rows BEFORE any join
    (map-side-combinable groupBy); the lag expansion crosses that tiny
    series with a 7-row broadcast frame, never the raw events.  `daily`
    feeds both series legs — persisted so the events scan runs once
    (diamond rule).  Days missing from either series drop via the inner
    join; n per lag reflects the actual aligned-pair count."""
    ev = load(spark, sf_dir, "events")
    # Diamond: both series legs slice this aggregate — persist the
    # (type x day) rollup, not the events scan.
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    x = daily.where(F.col("event_type") == "click").select("day", "c")
    y = daily.where(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("c").alias("yv")
    )
    lags = spark.range(7).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("yday", F.date_add("day", F.col("lag")))
        .join(y, "yday")
        .select("lag", F.col("c").alias("xv"), "yv")
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        "lag",
        "n",
        # den = 0 (a constant aligned series) would make the ratio NaN,
        # and Spark's floor(NaN)->0 diverges from DuckDB's NaN
        # propagation — guard mirrored in the oracle.
        F.when(
            den > 0,
            F.floor(num / den * 10000 + F.lit(0.5)).cast("long"),
        ).alias("xcorr_e4"),
    ).orderBy("lag")




@query(
    "evt_survival_km",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
    seq AS (
        SELECT user_id, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    gaps AS (
        SELECT CASE WHEN nxt IS NOT NULL
                    THEN (epoch_us(nxt) - epoch_us(ts)) // 3600000000
                    ELSE (epoch_us((SELECT max_ts FROM mx)) - epoch_us(ts))
                         // 3600000000 END AS d,
               CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM seq
    ),
    rollup AS (
        SELECT CAST(d AS BIGINT) AS d,
               CAST(SUM(observed) AS BIGINT) AS d_i,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM gaps GROUP BY d
    ),
    risk AS (
        SELECT d, d_i,
               CAST(SUM(c) OVER (ORDER BY d DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_risk
        FROM rollup
    ),
    km AS (
        SELECT d, d_i, n_risk,
               SUM(CASE WHEN d_i > 0 AND d_i < n_risk
                        THEN LN(1.0 - CAST(d_i AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY d ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lsum
        FROM risk
    )
    SELECT d, n_risk, d_i,
           CAST(FLOOR(EXP(lsum) * 1000000 + 0.5) AS BIGINT) AS surv_e6
    FROM km WHERE d_i > 0 AND d_i < n_risk ORDER BY d
    """,
)
def evt_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over TIME-TO-NEXT-EVENT with
    right censoring — "what fraction of inter-event waits survive past
    h hours?", the churn-hazard curve behind re-engagement triggers.
    Each consecutive event pair per user contributes an OBSERVED gap;
    each user's open-ended final wait (last event → corpus end) is
    CENSORED: it shrinks the risk set without counting as an event —
    dropping censored waits (the naive mistake) biases survival low.
    S(h) = prod_{d<=h}(1 - d_i / n_i) over event gaps d in whole hours.

    (A user-LIFETIME survival framing is vacuous on this corpus — every
    synthetic user stays active to the final week, so lifetimes are all
    censored and the curve has zero events; gap survival has ~10k
    observations and genuine censoring.)

    Exactness: gap hours are exact integer epoch-µs division (both
    engines truncate toward zero; deltas are non-negative by the LEAD
    ordering); d_i and the reverse-cumsum risk set are exact BIGINTs;
    the KM product closes as a RUNNING SUM of ln terms over the gap
    rollup — a running frame accumulates in row order on both engines,
    one fixed IEEE chain — then one exp, floor-pinned e6.  The
    d_i = n_risk corner (the largest gap bucket, everyone at risk
    exits) is excluded on both sides rather than emitting ln(0).

    Scale shape: ONE shuffle on user_id for the LEAD sequence, then a
    map-side-combinable rollup to |distinct gap hours| rows — bounded
    by the corpus time span, so the two unpartitioned running windows
    (allow-listed) never see event-scale input."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", F.lead("ts").over(w_seq).alias("nxt")
    ).join(F.broadcast(mx))
    gaps = seq.select(
        F.expr(
            "CASE WHEN nxt IS NOT NULL"
            " THEN (unix_micros(nxt) - unix_micros(ts)) div 3600000000"
            " ELSE (unix_micros(max_ts) - unix_micros(ts)) div 3600000000"
            " END"
        ).alias("d"),
        F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("observed"),
    )
    rollup = gaps.groupBy("d").agg(
        F.sum("observed").cast("long").alias("d_i"),
        F.count(F.lit(1)).alias("c"),
    )
    w_desc = Window.orderBy(F.col("d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = rollup.select(
        "d", "d_i", F.sum("c").over(w_desc).cast("long").alias("n_risk")
    )
    w_asc = Window.orderBy(F.col("d").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.when(
        (F.col("d_i") > 0) & (F.col("d_i") < F.col("n_risk")),
        F.log(F.lit(1.0) - F.col("d_i").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    km = risk.select(
        "d", "d_i", "n_risk", F.sum(term).over(w_asc).alias("lsum")
    )
    return (
        km.where((F.col("d_i") > 0) & (F.col("d_i") < F.col("n_risk")))
        .select(
            "d",
            "n_risk",
            "d_i",
            F.floor(F.exp("lsum") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("surv_e6"),
        )
        .orderBy("d")
    )


@query(
    "evt_holt_linear",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'click'
        GROUP BY 1
    ),
    series AS (
        SELECT list_transform(
                   list_sort(list({'day': day, 'y': y})),
                   r -> CAST(r.y AS DOUBLE)) AS ys
        FROM daily
    ),
    folded AS (
        -- state as [l, b, sse]: a LIST accumulator, not a struct —
        -- DuckDB list_reduce mis-evaluates struct accumulators across
        -- steps (fields see stale/partial state from step 2 on;
        -- probed r10), while the homogeneous list fold is exact.
        SELECT len(ys) AS n_days,
               list_reduce(
                   list_prepend([ys[1], ys[2] - ys[1], 0.0],
                                list_transform(ys[3:], v -> [v])),
                   (acc, x) -> [
                       0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                       0.25 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2]))
                               - acc[1]) + 0.75 * acc[2],
                       acc[3] + (x[1] - (acc[1] + acc[2]))
                                * (x[1] - (acc[1] + acc[2]))
                   ]) AS st
        FROM series
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(FLOOR(st[1] * 1000000 + 0.5) AS BIGINT) AS level_e6,
           CAST(FLOOR(st[2] * 1000000 + 0.5) AS BIGINT) AS trend_e6,
           CAST(FLOOR(st[3] * 100 + 0.5) AS BIGINT) AS sse_e2,
           CAST(FLOOR((st[1] + st[2]) * 1000000 + 0.5) AS BIGINT)
               AS forecast_e6
    FROM folded
    """,
)
def evt_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S LINEAR-TREND exponential smoothing over the daily click
    series — a COUPLED-STATE RECURRENCE (lₜ, bₜ each depend on both
    previous states), the class no window frame can express (EWMA's
    single state unrolls into a weighted window sum —
    `evt_ewma_integer`; Holt does not).  The Spark-first answer for a
    BOUNDED series: reduce the corpus to the per-day rollup (calendar-
    sized by construction), pack it into ONE ordered array, and run
    the recurrence as an in-array `F.aggregate` fold with a struct
    accumulator — sequential semantics, zero driver-side iteration,
    and the corpus-scale work (the daily rollup) stays a one-pass
    map-side-combinable aggregate.

    α = 1/2, β = 1/4 (dyadic — every smoothing multiply is exact in
    binary); the fold's float ops run in ONE fixed sequential order on
    both engines (DuckDB list_reduce mirrors the same struct fold, with
    state and elements sharing one struct type since its accumulator
    must match the element type), so level/trend/SSE/one-step forecast
    pin bit-identically.  Interpreted-HOF cost is |days| lambda evals —
    nothing (the >200/row rule governs per-ROW folds, not one bounded
    series).

    At 100 TB: the rollup is still |days| rows; thousands of PARALLEL
    series (per segment/region) fold independently inside a groupBy —
    this single-series key is the degenerate case of that shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count("*").alias("y")
    )
    series = daily.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda r: r.getField("y").cast("double"),
        ).alias("ys")
    )
    ys = F.col("ys")
    # try_element_at, not element_at: ANSI element_at THROWS
    # INVALID_ARRAY_INDEX on a <2-day series while DuckDB ys[2] yields
    # NULL — the guarded form makes both engines emit NULL state on a
    # degenerate corpus (r10 ADVICE).
    zero = F.struct(
        F.try_element_at(ys, F.lit(1)).alias("l"),
        (F.try_element_at(ys, F.lit(2)) - F.try_element_at(ys, F.lit(1))).alias(
            "b"
        ),
        F.lit(0.0).alias("sse"),
    )
    rest = F.slice(ys, 3, F.greatest(F.size(ys) - 2, F.lit(0)))

    def step(acc, y):
        l, b, sse = acc.getField("l"), acc.getField("b"), acc.getField("sse")
        l_new = y * 0.5 + (l + b) * 0.5
        return F.struct(
            l_new.alias("l"),
            ((l_new - l) * 0.25 + b * 0.75).alias("b"),
            (sse + (y - (l + b)) * (y - (l + b))).alias("sse"),
        )

    st = F.aggregate(rest, zero, step)
    folded = series.select(F.size(ys).cast("long").alias("n_days"), st.alias("st"))
    l, b, sse = (
        F.col("st").getField("l"),
        F.col("st").getField("b"),
        F.col("st").getField("sse"),
    )
    return folded.select(
        "n_days",
        F.floor(l * 1000000 + F.lit(0.5)).cast("long").alias("level_e6"),
        F.floor(b * 1000000 + F.lit(0.5)).cast("long").alias("trend_e6"),
        F.floor(sse * 100 + F.lit(0.5)).cast("long").alias("sse_e2"),
        F.floor((l + b) * 1000000 + F.lit(0.5)).cast("long").alias("forecast_e6"),
    )


@query(
    "evt_twap",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               epoch_us(ts) AS us,
               event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE user_id % 17 = 0
    ),
    seg AS (
        SELECT user_id, day, cents,
               LEAD(us) OVER (PARTITION BY user_id, day
                              ORDER BY us, event_id) - us AS dur_us
        FROM ev
    ),
    agg AS (
        SELECT user_id, day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(dur_us) AS BIGINT) AS span_us,
               CAST(SUM(cents * dur_us) AS BIGINT) AS wsum
        FROM seg GROUP BY user_id, day
    )
    SELECT user_id, day, n_events, span_us,
           CAST(wsum // span_us AS BIGINT) AS twap_cents
    FROM agg WHERE span_us > 0
    """,
)
def evt_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average value (TWAP) per user-day — the metric
    that replaces a plain mean whenever observations persist until the
    next one (prices, sensor readings, session quality): each event's
    value is weighted by how long it remained current, i.e. the µs gap
    to the user's next event that day; the day's last event gets zero
    weight (nothing follows it inside the window).

    ALL-INTEGER exactness: weights are exact µs longs, values exact
    cents, the weighted sum Σ(cents·dur) stays ≤ ~8.6e15 per segment
    (cents ≤ 1e5 × dur ≤ 8.64e10) — inside int64 — and the TWAP is ONE
    integer division (`div`/`//`, both truncate; operands non-negative
    → floor).  Equal-timestamp events get a deterministic order
    (event_id tiebreak in the LEAD) and zero-duration segments weigh
    nothing, so ties cannot flip the result; single-event days
    (span 0) are excluded on both engines — the x/0 guard.

    Scale: one shuffle on user_id serves the (user_id, day) window AND
    the (user_id, day) groupBy (subset rule — the window partitioning
    is a prefix of the agg keys); the user-residue filter is
    semantically upfront (TWAP is per-user — dropping users never
    changes survivors' values) and bounds the verified output."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 17 == 0)
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("user_id", "day").orderBy("us", "event_id")
    seg = ev.select(
        "user_id",
        "day",
        "cents",
        (F.lead("us").over(w) - F.col("us")).alias("dur_us"),
    )
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("dur_us").alias("span_us"),
            F.sum(F.col("cents") * F.col("dur_us")).alias("wsum"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "day",
            "n_events",
            "span_us",
            F.expr("wsum div span_us").cast("long").alias("twap_cents"),
        )
    )


# Shared by the batch key below and stream_match_recognize
# (engine/streaming.py): the streaming state machine over time-ordered
# microbatches must emit EXACTLY the batch matches, so both carry the
# same full oracle.
MATCH_RECOGNIZE_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    nb AS (
        SELECT user_id, event_id, ts, event_type, rn,
               LEAD(event_type) OVER w AS nxt_type,
               LEAD(event_id) OVER w AS nxt_id,
               LEAD(ts) OVER w AS nxt_ts,
               LEAD(rn) OVER w AS nxt_rn
        FROM seq WHERE event_type <> 'click'
        WINDOW w AS (PARTITION BY user_id ORDER BY rn)
    )
    SELECT user_id,
           event_id AS start_event_id,
           nxt_id AS end_event_id,
           CAST(nxt_rn - rn - 1 AS BIGINT) AS n_clicks_between,
           CAST(epoch_us(CAST(nxt_ts AS TIMESTAMP))
                - epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_us
    FROM nb
    WHERE event_type = 'view' AND nxt_type = 'purchase'
    """


@query("evt_match_recognize", oracle=MATCH_RECOGNIZE_ORACLE)
def evt_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style event-pattern detection (SQL:2016 row
    pattern matching; Flink CEP's core shape) — Spark has no native
    MATCH_RECOGNIZE, so the engine compiles the pattern
    ``view click* purchase`` (per user, contiguous in event order)
    into windows: the KEY identity is that a greedy `A B* C` match
    exists exactly where C is the NEXT NON-B event after an A — so
    project the per-user stream onto its non-B subsequence (one
    filter) and pair each 'view' with its LEAD.  Click-count between
    = full-stream row-number gap minus one; both row numbers come
    from ONE user_id exchange (the filtered second window re-uses the
    partitioning — subset rule, no second shuffle).

    Deterministic ordering: (ts, event_id) — ts alone collides.

    Scale: two window passes over one user_id-partitioned exchange,
    no join, no state explosion — pattern state is O(1) per row
    (unlike a regex-NFA CEP engine, this compilation is possible for
    any A B* C / A B? C / first-match-per-window pattern family; the
    general nested-pattern case would go to
    applyInPandasWithState)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w_all))
    w_nb = Window.partitionBy("user_id").orderBy("rn")
    nb = seq.filter(F.col("event_type") != "click").select(
        "user_id", "event_id", "ts", "event_type", "rn",
        F.lead("event_type").over(w_nb).alias("nxt_type"),
        F.lead("event_id").over(w_nb).alias("nxt_id"),
        F.lead("ts").over(w_nb).alias("nxt_ts"),
        F.lead("rn").over(w_nb).alias("nxt_rn"),
    )
    return nb.filter(
        (F.col("event_type") == "view") & (F.col("nxt_type") == "purchase")
    ).select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        F.col("nxt_id").alias("end_event_id"),
        (F.col("nxt_rn") - F.col("rn") - 1).cast("long").alias("n_clicks_between"),
        (
            F.unix_micros(F.col("nxt_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).cast("long").alias("gap_us"),
    )
