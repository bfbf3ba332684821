"""Product-analytics query declarations (SCD2 history, retention
cohorts, funnel conversion) — see ``operators/analytics.py`` for
the plan-shape rationale."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import analytics as AN
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type,
           CAST(effective_from AS TIMESTAMP_NS) AS effective_from,
           CAST(effective_to AS TIMESTAMP_NS) AS effective_to,
           effective_to IS NULL AS is_current
    FROM (
      SELECT user_id, event_type, ts AS effective_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS effective_to
      FROM changes)
    """,
)
def scd2_history(spark, sf_dir):
    """Type-2 slowly-changing history of each user's event_type
    state: change detection + interval close-off, two keyed window
    passes, no joins."""
    return AN.scd2_history(read_table(spark, sf_dir, "events"))


@register(
    "agg_retention_cohorts",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    first_day AS (
      SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY 1)
    SELECT CAST(cohort_day AS TIMESTAMP_NS) AS cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT)
             AS offset_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM user_days JOIN first_day USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users bucketed by first-activity
    day, counted per day-offset of subsequent activity."""
    return AN.retention_cohorts(read_table(spark, sf_dir, "events"))


@register(
    "agg_funnel_steps",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
      FROM events GROUP BY 1),
    r AS (
      SELECT (t0 IS NOT NULL) AS r0,
             (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0) AS r1,
             (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
              AND t2 IS NOT NULL AND t2 > t1) AS r2
      FROM per_user)
    SELECT CAST(0 AS BIGINT) AS step, 'view' AS event_type,
           CAST(sum(CAST(r0 AS INT)) AS BIGINT) AS n_users FROM r
    UNION ALL
    SELECT 1, 'click', CAST(sum(CAST(r1 AS INT)) AS BIGINT) FROM r
    UNION ALL
    SELECT 2, 'purchase', CAST(sum(CAST(r2 AS INT)) AS BIGINT) FROM r
    """,
)
def agg_funnel_steps(spark, sf_dir):
    """Ordered view→click→purchase funnel: one conditional agg per
    user (no per-step self-joins), strict time ordering between
    steps."""
    return AN.funnel_conversion(read_table(spark, sf_dir, "events"))


@register(
    "join_dim_snapshot_asof",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    hist AS (
      SELECT user_id, event_type, ts AS effective_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS effective_to
      FROM changes),
    purchases AS (
      SELECT event_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts,
           p.value, h.event_type AS state_at_purchase
    FROM purchases p JOIN hist h
      ON p.user_id = h.user_id
     AND h.effective_from <= p.ts
     AND (h.effective_to IS NULL OR p.ts < h.effective_to)
    """,
)
def join_dim_snapshot_asof(spark, sf_dir):
    """Point-in-time join against a type-2 dimension: each purchase
    picks up the user's state VALID AT the purchase timestamp. The
    100 TB-critical re-expression: instead of an interval-containment
    inequality join against the history table (O(n·k) nested-loop or
    a range-bucketed approximation), PIT-against-SCD2 is EXACTLY a
    backward as-of join to the change points — one shuffle, one keyed
    window (operators/temporal.asof_join). The oracle is the naive
    interval-containment join, so agreement proves the equivalence."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    from etl_jobs_spark.operators import temporal as TP

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return TP.asof_join(
        purchases,
        changes,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        right_payload=["event_type"],
        prefix="",
    ).withColumnRenamed("event_type", "state_at_purchase")


@register(
    "agg_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      FROM events),
    grouped AS (
      SELECT user_id, day_num,
             day_num - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day_num) AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_len
      FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def agg_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: each user's consecutive-day activity
    streaks (longest streak, streak count, active days) — the
    engagement metric behind every retention dashboard, and the
    canonical SQL island detection: distinct activity days, then
    ``day_number − row_number`` is CONSTANT within a consecutive run
    (both step by one), so a groupBy on that difference recovers the
    islands with no self-join and no iteration. All-integer
    arithmetic (epoch-day numbers), bit-exact. Scale shape: one
    distinct + one keyed window + two keyed aggs, every stage
    partitioned by user — a single shuffle family, no fan-out."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").alias(
            "day_num"
        ),
    ).distinct()
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("day_num")
    )
    streaks = (
        days.withColumn("grp", F.col("day_num") - rn)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").alias("n_active_days"),
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
