"""Product-analytics operators: SCD2 history, retention cohorts,
funnels.

The reference's closest ancestor is the per-run metrics report
(`src/etl_2022.py:25-44`) — point-in-time only; history tracking,
cohort retention and funnel conversion are the standard next asks of
the same events data, so the engine ships them as first-class
operators.

Scale shapes:
- SCD2 is two keyed window passes over the entity key (change
  detection, then interval close-off) — state per key is one row of
  lag/lead, partitions are user-sized, no joins.
- Retention is two keyed aggs (first-touch per user, then
  cohort × offset counts) — the user-day dedup happens in the first
  agg's shuffle, and the cohort report is tiny.
- The funnel is one conditional aggregation per user (min event
  time per step), then step comparisons — one shuffle on the user
  key; no self-joins per step, which is the classic funnel
  anti-pattern (N scans for N steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Funnel definition over the events fixture.
FUNNEL_STEPS = ("view", "click", "purchase")


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 history of each user's ``event_type`` state: one row
    per state CHANGE with [effective_from, effective_to) validity
    and an is_current flag (effective_to NULL on the open row)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        "event_type",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    per day-offset of later activity. Two keyed aggs; the
    (user, day) distinct rides the first shuffle."""
    user_days = (
        events.select(
            "user_id", F.to_date("ts").alias("day")
        ).distinct()
    )
    first_day = user_days.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        user_days.join(first_day, "user_id")
        .select(
            # surfaced as TIMESTAMP, not DATE — the repo's oracle
            # convention for temporal outputs (UTC midnight)
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("bigint").alias("offset_days"),
            "user_id",
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered funnel conversion: per-user earliest time of each
    step, a step counts only if it happens AFTER the user's previous
    step's earliest time. ONE conditional aggregation per user (no
    per-step self-joins), then one tiny union of step counts."""
    per_user = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(
                f"t{i}"
            )
            for i, s in enumerate(steps)
        ]
    )
    # reached_i: every step up to i happened, strictly ordered
    reached = per_user
    conds = []
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if i > 0:
            c = c & (F.col(f"t{i}") > F.col(f"t{i-1}"))
        conds.append(c if i == 0 else (conds[i - 1] & c))
    for i in range(len(steps)):
        reached = reached.withColumn(f"r{i}", conds[i])
    counts = reached.agg(
        *[
            F.sum(F.col(f"r{i}").cast("bigint")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = None
    for i, s in enumerate(steps):
        step_row = counts.select(
            F.lit(i).cast("bigint").alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n{i}").alias("n_users"),
        )
        rows = step_row if rows is None else rows.unionByName(step_row)
    return rows
