"""Time-series resampling: bucket, gap-fill, interpolate.

The reference has no time-series surface at all (`processed_at` is a
processing-time audit column, `src/etl_2025.py:211`); regular-grid
resampling with linear interpolation is the standard feature-prep
step for ML over event timelines, so the engine ships it as a
first-class operator.

Scale design: one keyed aggregation to the bucket grid, one tiny
per-key agg for the spine bounds, a map-only sequence()+explode to
generate the dense grid (the spine never shuffles — it is derived
from the bounds row), one left join back to the observations (both
sides hash-partitioned on user_id+bucket), and two keyed window
passes for the carry-forward/backward values. Nothing driver-side,
nothing quadratic; per-user state is bounded by the grid span, and
at cluster scale every stage partitions on the user key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Resample grid: 4-hour buckets (the fixture timeline spans 30
#: days, so a user's spine is ~180 rows).
BUCKET_S = 14_400

#: Loud ceiling on one user's grid span, in buckets (~45 years at
#: the 4-hour default). A single corrupt far-era timestamp would
#: otherwise make sequence() materialize a multi-million-row spine
#: PER AFFECTED USER and feed it through two unbounded windows —
#: observed as a hang on the round-11 timestamp-boundary axis
#: (1677/2262-era instants -> 1.28M buckets/user, both engines).
#: Real gap-fillers (e.g. TimescaleDB's time_bucket_gapfill) require
#: explicit finite bounds for exactly this reason; this engine keeps
#: the data-derived bounds but fails LOUDLY past the cap instead of
#: silently exploding work — the money tier's fail-loud discipline.
MAX_SPAN_BUCKETS = 100_000


def resample_interpolate(
    events: DataFrame, bucket_s: int = BUCKET_S
) -> DataFrame:
    """Per-user regular grid of ``bucket_s``-second buckets from the
    user's first to last event, with avg(value) per observed bucket
    and linear interpolation across gaps.

    Returns (user_id, bucket, val, observed): ``bucket`` is the
    epoch-seconds grid index, ``val`` the observed bucket mean or
    the interpolated value, rounded to 4.
    """
    sec = F.col("ts").cast("timestamp").cast("double")
    obs = (
        events.select(
            "user_id",
            F.floor(sec / bucket_s).cast("bigint").alias("bucket"),
            "value",
        )
        .groupBy("user_id", "bucket")
        # exact decimal sum / count instead of avg(): bit-identical
        # bucket means across engines (no float-summation-order
        # noise), so the interpolation arithmetic downstream is
        # bit-identical too and the final round(4) can't straddle
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("obs_val")
        )
    )
    # in-plan span guard (no extra job): a span past MAX_SPAN_BUCKETS
    # raises inside the same projection that would have exploded
    b1_guarded = F.when(
        F.col("b1") - F.col("b0") <= F.lit(MAX_SPAN_BUCKETS), F.col("b1")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "resample_interpolate: user grid span exceeds "
                    f"MAX_SPAN_BUCKETS={MAX_SPAN_BUCKETS} buckets "
                    "(corrupt timestamp?) for user_id="
                ),
                F.col("user_id").cast("string"),
            )
        ).cast("bigint")
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "user_id",
            F.explode(F.sequence("b0", b1_guarded)).alias("bucket"),
        )
    )
    grid = spine.join(obs, ["user_id", "bucket"], "left")

    back = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(
        F.col("obs_val").isNotNull(), F.col("bucket")
    )
    filled = grid.select(
        "user_id",
        "bucket",
        "obs_val",
        F.last("obs_val", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(back).alias("pb"),
        F.first("obs_val", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(fwd).alias("nb"),
    )
    interp = (
        F.when(F.col("obs_val").isNotNull(), F.col("obs_val"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("bucket") - F.col("pb"))
            / (F.col("nb") - F.col("pb"))
        )
    )
    # NOT F.round(): interpolated values land EXACTLY on .00005
    # boundaries (clean-decimal inputs × dyadic gap fractions), where
    # Spark's BigDecimal HALF_UP and DuckDB's float round disagree.
    # floor(x*1e4 + 0.5)/1e4 is the same IEEE op sequence in every
    # engine → identical output on identical doubles.
    rounded = F.floor(interp * 10000.0 + 0.5) / 10000.0
    return filled.select(
        "user_id",
        "bucket",
        rounded.alias("val"),
        F.col("obs_val").isNotNull().alias("observed"),
    )
