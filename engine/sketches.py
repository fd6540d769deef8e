"""DataSketches-native sketch operators (Spark 4 theta / KLL families).

Completes the mergeable-sketch family next to HLL (`agg_hll_partitioned_
merge`), bitmap (`agg_bitmap_distinct`) and count-min (`agg_cms_heavy_
hitters`): Theta sketches add SET OPERATIONS on distinct-count state
(union / intersection / difference — HLL unions only), and KLL adds
mergeable quantiles.  Both ship in Spark 4.1 as native JVM aggregates
(`theta_sketch_agg`, `kll_sketch_agg_double`, …) backed by the Apache
DataSketches library — partial aggregation (map-side combine) applies,
so each 100 TB scan partition reduces to one fixed-size sketch blob
before the shuffle, and per-segment sketches roll up without rescans.

Determinism discipline: a theta sketch in EXACT MODE (retained entries
< nominal k, default lgK=12 → 4096) stores every distinct hash, so its
estimate IS the exact distinct count — and intersections/differences of
exact-mode sketches stay exact.  The corpus cardinalities here are
bounded BY CONSTRUCTION under k (≤150 users, ≤3600 user×hour cells at
any SF's per-group slice at the oracle gate), so the theta keys are
full-hash DuckDB-verified.  KLL is genuinely approximate at any size
(compaction is level-randomized) → declared rows-only with a pinned
rank-error floor in tests/test_unit_semantics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.core import query
from engine.io import load


@query(
    "sketch_theta_distinct",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               date_trunc('week', ts) AS wk,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wk_users
        FROM events
        GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_weeks,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events e WHERE e.event_type = weekly.event_type)
               AS users_union,
           CAST(SUM(wk_users) AS BIGINT) AS users_weekly_sum
    FROM weekly
    GROUP BY event_type
    """,
)
def sketch_theta_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct counting with PARTITION MERGE: one sketch
    per (event_type, week) over user_id, weekly sketches rolled up per
    event_type via ``theta_union_agg`` — the incremental-refresh shape
    (per-day/week segment sketches persisted once, any window's distinct
    answered by merging blobs, no rescan).  ``users_weekly_sum`` (the
    naive per-week sum) is emitted next to ``users_union`` to expose
    exactly the double-counting a mergeable sketch exists to avoid.

    Exactness contract: per-group distinct ≤ 150 users ≪ 4096 nominal
    entries → every sketch is in exact mode and the estimate equals
    COUNT(DISTINCT); the DuckDB oracle hash-verifies it.  At 100 TB the
    same plan degrades gracefully to ±1.6% estimates while the shuffle
    still carries one ≤32 KB blob per (type, week) regardless of rows.

    Scale: theta_sketch_agg partial-aggregates (map-side combine) —
    the scan's shuffle output is sketch blobs, not user ids; the weekly
    rollup is a second tiny blob-merge agg."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.theta_sketch_agg("user_id").alias("sk"))
    return (
        weekly.groupBy("event_type")
        .agg(
            F.count("*").alias("n_weeks"),
            F.theta_sketch_estimate(F.theta_union_agg("sk"))
            .alias("users_union"),
            F.sum(F.theta_sketch_estimate("sk")).alias("users_weekly_sum"),
        )
        .select("event_type", "n_weeks", "users_union", "users_weekly_sum")
    )


@query(
    "sketch_theta_setops",
    oracle="""
    WITH cells AS (
        SELECT DISTINCT event_type,
               user_id * 24 + EXTRACT(hour FROM ts) AS cell
        FROM events
        WHERE event_type IN ('click', 'purchase', 'error')
    )
    SELECT
        CAST((SELECT COUNT(*) FROM cells WHERE event_type = 'click')
             AS BIGINT) AS n_click,
        CAST((SELECT COUNT(*) FROM cells WHERE event_type = 'purchase')
             AS BIGINT) AS n_purchase,
        CAST((SELECT COUNT(*) FROM (
              SELECT cell FROM cells WHERE event_type = 'click'
              INTERSECT
              SELECT cell FROM cells WHERE event_type = 'purchase'))
             AS BIGINT) AS n_click_and_purchase,
        CAST((SELECT COUNT(*) FROM (
              SELECT cell FROM cells WHERE event_type = 'click'
              EXCEPT
              SELECT cell FROM cells WHERE event_type = 'error'))
             AS BIGINT) AS n_click_not_error,
        CAST((SELECT COUNT(DISTINCT cell) FROM cells) AS BIGINT) AS n_any
    """,
)
def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET OPERATIONS — the capability HLL lacks and the
    reason warehouses keep theta state: audience overlap ("users who
    clicked AND purchased in the same hour-of-day"), exclusion
    ("clicked but never errored there") and reach, all answered from
    three per-segment sketch blobs via ``theta_intersection`` /
    ``theta_difference`` / ``theta_union`` without touching raw ids
    again.  The entity is a user×hour cell (user_id·24 + hour, ≤3600
    distinct per segment — deliberately non-degenerate: at this corpus
    every user eventually fires every type, so raw user overlap would
    be trivially total) and stays under the 4096-entry exact-mode bound,
    so every set-op result is exact and DuckDB INTERSECT/EXCEPT
    hash-verifies it.

    Scale: one scan builds all three sketches (map-side combined,
    grouped by type); the set algebra then runs on three ≤32 KB blobs
    on a single row — the 100 TB overlap query that never re-shuffles
    ids."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase", "error")
    )
    cell = (F.col("user_id") * 24 + F.hour("ts")).alias("cell")
    sk = (
        ev.select("event_type", cell)
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("cell").alias("sk"))
        .groupBy()
        .pivot("event_type", ["click", "purchase", "error"])
        .agg(F.first("sk"))
    )
    return sk.select(
        F.theta_sketch_estimate("click").alias("n_click"),
        F.theta_sketch_estimate("purchase").alias("n_purchase"),
        F.theta_sketch_estimate(
            F.theta_intersection("click", "purchase")
        ).alias("n_click_and_purchase"),
        F.theta_sketch_estimate(
            F.theta_difference("click", "error")
        ).alias("n_click_not_error"),
        F.theta_sketch_estimate(
            F.theta_union(F.theta_union("click", "purchase"), "error")
        ).alias("n_any"),
    )


@query("sketch_kll_quantiles", oracle=None)  # rows-only: KLL is randomized
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL mergeable quantiles (Karnin-Lang-Liberty, the DataSketches
    successor to GK): one sketch per (event_type, day) over `value`,
    per-day blobs merged to per-type totals via ``kll_merge_agg_double``
    — the same persisted-segment rollup shape as the theta key, for
    percentiles.  Output carries the KLL p50/p90/p99 NEXT TO the exact
    percentiles and the absolute error, so the estimate quality is
    visible in the result itself; tests/test_unit_semantics.py pins the
    normalized RANK error of every estimate ≤ 3% (k=200's published
    ~1.65% single-sided bound with headroom), which is the guarantee
    KLL actually makes (rank space, not value space).

    Rows-only: KLL compaction discards by level-randomized coin flips —
    not SQL-reproducible by design.

    Scale: at 100 TB the exact-percentile audit columns would be
    dropped; what remains shuffles one ~O(k log n) blob per segment
    instead of sorting 10^12 doubles — the entire point of the sketch."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.kll_sketch_agg_double("value").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.expr("kll_merge_agg_double(sk)").alias("sk"),
        F.count("*").alias("n_days"),
    )
    est = merged.select(
        "event_type",
        "n_days",
        F.expr("kll_sketch_get_n_double(sk)").alias("n"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.5)").alias("p50_kll"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.9)").alias("p90_kll"),
        F.expr("kll_sketch_get_quantile_double(sk, 0.99)").alias("p99_kll"),
    )
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.9)").alias("p90_exact"),
        F.expr("percentile(value, 0.99)").alias("p99_exact"),
    )
    return (
        est.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_days",
            "n",
            "p50_kll",
            "p50_exact",
            "p90_kll",
            "p90_exact",
            "p99_kll",
            "p99_exact",
            # floor-pinned e6 (r9 VERDICT): every declared double in the
            # repo is pinned; keeps this key upgrade-ready should the
            # exact audit columns ever gain an oracle twin.
            F.floor(
                F.abs(F.col("p50_kll") - F.col("p50_exact")) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("p50_abs_err_e6"),
        )
        .orderBy("event_type")
    )
