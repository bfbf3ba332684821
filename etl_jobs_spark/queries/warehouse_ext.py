"""Warehouse-maintenance + matching + time-series queries (round 2
breadth: MERGE upsert, unpivot, fuzzy entity pairs, resample/
interpolate). See the operator modules (``operators/warehouse.py``,
``operators/matching.py``, ``operators/timeseries.py``) for the
scale rationale of each plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_jobs_spark.operators import money as M

from etl_jobs_spark.operators import matching as MT
from etl_jobs_spark.operators import timeseries as TS
from etl_jobs_spark.operators import warehouse as WH
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


@register(
    "fuzzy_pairs_names",
    oracle="""
    -- DISTINCT: the operator returns SET-of-(key_a, key_b, dist)
    -- semantics (fuzzy_pairs ends in .distinct()); without it a
    -- duplicate-key input row multiplies oracle pair rows
    -- (round-12 duplicate-key axis)
    SELECT DISTINCT key_a, key_b, dist FROM (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey)
    WHERE dist <= 1
    """,
)
def fuzzy_pairs_names(spark, sf_dir):
    """Edit-distance-1 name pairs via SymSpell deletion-neighborhood
    blocking (map-only variant explode → equi-join → exact
    levenshtein verify; never all-pairs). The oracle IS the all-pairs
    scan — fine for an oracle, the thing the operator exists to
    avoid."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return MT.fuzzy_pairs(cust, "c_custkey", "c_name")


_B = TS.BUCKET_S
_SPAN_CAP = TS.MAX_SPAN_BUCKETS


@register(
    "ts_resample_interpolate",
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {_B}) AS BIGINT) AS bucket,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS obs_val
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM obs GROUP BY 1),
    spine AS (
      -- span guard mirrored from the operator (MAX_SPAN_BUCKETS):
      -- one corrupt far-era timestamp must fail LOUDLY, not
      -- materialize a multi-million-row per-user grid (round-11
      -- timestamp-boundary axis)
      SELECT user_id,
             unnest(generate_series(b0,
               CASE WHEN b1 - b0 <= {_SPAN_CAP} THEN b1
                    ELSE error('resample span cap exceeded') END))
               AS bucket
      FROM bounds),
    grid AS (
      SELECT s.user_id, s.bucket, o.obs_val
      FROM spine s LEFT JOIN obs o USING (user_id, bucket)),
    filled AS (
      SELECT user_id, bucket, obs_val,
        last_value(obs_val IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                   IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(obs_val IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                    IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM grid)
    SELECT user_id, bucket,
           floor((CASE WHEN obs_val IS NOT NULL THEN obs_val
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * (bucket - pb) / (nb - pb)
                  END) * 10000.0 + 0.5) / 10000.0 AS val,
           obs_val IS NOT NULL AS observed
    FROM filled
    """,
)
def ts_resample_interpolate(spark, sf_dir):
    """Per-user 4-hour resample grid with linear interpolation across
    unobserved buckets (gap-fill) — the regular-grid feature-prep
    step for ML over event timelines."""
    return TS.resample_interpolate(read_table(spark, sf_dir, "events"))


@register(
    "merge_upsert_customers",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 100 AS c_acctbal, c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 97 <> 3
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      FROM customer WHERE c_custkey % 97 = 3
      UNION ALL
      SELECT c_custkey + 1000000, concat('NEW#', c_name), c_nationkey,
             0.0, c_mktsegment, 'U'
      FROM customer WHERE c_custkey < 50),
    merged AS (
      SELECT c_custkey,
             CASE WHEN c.op IS NOT NULL THEN c.c_name
                  ELSE b.c_name END AS c_name,
             CASE WHEN c.op IS NOT NULL THEN c.c_nationkey
                  ELSE b.c_nationkey END AS c_nationkey,
             CASE WHEN c.op IS NOT NULL THEN c.c_acctbal
                  ELSE b.c_acctbal END AS c_acctbal,
             CASE WHEN c.op IS NOT NULL THEN c.c_mktsegment
                  ELSE b.c_mktsegment END AS c_mktsegment,
             c.op
      FROM customer b FULL OUTER JOIN changes c USING (c_custkey))
    SELECT c_custkey, c_name, c_nationkey,
           round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM merged WHERE op IS NULL OR op <> 'D'
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """MERGE INTO as a transform: apply a deterministic change batch
    (updates for custkey%10=0, deletes for custkey%97=3 — delete
    wins on overlap — inserts for custkey<50 rekeyed +1M) to the
    customer table via one full-outer sort-merge join."""
    cust = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upd = cust.filter((k % 10 == 0) & (k % 97 != 3)).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(WH.OP_UPSERT).alias("op"),
    )
    dele = cust.filter(k % 97 == 3).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(WH.OP_DELETE).alias("op"),
    )
    ins = cust.filter(k < 50).select(
        (k + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(WH.OP_UPSERT).alias("op"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = WH.merge_upsert(cust, changes, ["c_custkey"])
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 2))


@register(
    "agg_unpivot_metrics",
    oracle="""
    SELECT metric,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
           round(min(val), 2) AS vmin,
           round(max(val), 2) AS vmax
    FROM (
      SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'tax', l_tax FROM lineitem)
    GROUP BY metric
    """,
)
def agg_unpivot_metrics(spark, sf_dir):
    """Wide → long unpivot (stack generator, map-only) + per-metric
    profile. Sums run over DECIMAL(18,2) so they are EXACT — no
    float-summation-order hazard — then surface as DOUBLE."""
    li = read_table(spark, sf_dir, "lineitem")
    long = WH.unpivot_metrics(
        li,
        {
            "quantity": "l_quantity",
            "extendedprice": "l_extendedprice",
            "discount": "l_discount",
            "tax": "l_tax",
        },
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
        F.round(F.min("val"), 2).alias("vmin"),
        F.round(F.max("val"), 2).alias("vmax"),
    )


@register(
    "cdc_apply_changelog",
    oracle=f"""
    WITH mx AS (SELECT max(c_custkey) AS mk FROM customer),
    changes AS (
        SELECT CASE WHEN event_type = 'signup' THEN mk + 1 + user_id
                    ELSE user_id END AS key,
               {WH.cdc_op_expr("duckdb")} AS op,
               value AS newbal, ts, event_id AS seq
        FROM events, mx
    ),
    latest AS (
        SELECT key, op, newbal FROM (
            SELECT key, op, newbal,
                   row_number() OVER (PARTITION BY key
                                      ORDER BY ts DESC, seq DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    )
    SELECT COALESCE(b.c_custkey, c.key) AS c_custkey,
           COALESCE(b.c_name, 'cdc-' || CAST(c.key AS VARCHAR)) AS c_name,
           round(CASE WHEN c.op IS NOT NULL THEN c.newbal
                      ELSE b.c_acctbal END, 2) AS c_acctbal,
           CASE WHEN c.op IS NULL THEN 'kept'
                WHEN b.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS change_status
    FROM customer b FULL OUTER JOIN latest c ON b.c_custkey = c.key
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def cdc_apply_changelog(spark, sf_dir):
    """CDC changelog apply: compact an out-of-order I/U/D event feed
    to latest-per-key (one keyed window), then apply it to the
    customer snapshot in one full-outer join that reuses the window's
    partitioning — the Debezium/Delta-CDF ingestion pattern as a pure
    transform. Signups insert keys beyond the snapshot range, errors
    delete, the rest upsert."""
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    mx = cust.agg(F.max("c_custkey").alias("mk"))
    changes = ev.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "CASE WHEN event_type = 'signup' THEN mk + 1 + user_id"
            " ELSE user_id END"
        ).alias("key"),
        F.expr(WH.cdc_op_expr("spark")).alias("op"),
        F.col("value").alias("newbal"),
        "ts",
        F.col("event_id").alias("seq"),
    )
    return WH.cdc_latest_apply(cust, changes)


@register(
    "zorder_layout_stats",
    oracle=f"""
    WITH t AS (
        SELECT CAST(floor(
                   {WH.zorder_expr("(user_id % 256)",
                                   "least(255, CAST(floor(value / 2) AS BIGINT))",
                                   WH.ZORDER_BITS)}
                   / {WH.zorder_bucket_width()}) AS BIGINT) AS file_bucket,
               CAST((user_id % 256) AS BIGINT) AS ux,
               least(255, CAST(floor(value / 2) AS BIGINT)) AS vx
        FROM events
    )
    SELECT file_bucket, CAST(count(*) AS BIGINT) AS n_rows,
           min(ux) AS ux_min, max(ux) AS ux_max,
           min(vx) AS vx_min, max(vx) AS vx_max
    FROM t GROUP BY file_bucket
    """,
)
def zorder_layout_stats(spark, sf_dir):
    """Z-order layout audit: bucket events by an 8+8-bit Morton key
    over (user, value) into 64 file-sized ranges and report each
    file's min/max envelope in BOTH dimensions — the data-skipping
    stats a z-ordered write layout exists to tighten. The key is
    pure integer column algebra (portable floor-div/mod bit
    interleave, no UDF)."""
    return WH.zorder_layout_report(read_table(spark, sf_dir, "events"))


@register(
    "snapshot_diff_audit",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey AS key,
             md5(concat_ws('|', c_name, CAST(round(c_acctbal, 2) AS VARCHAR),
                           c_mktsegment)) AS rh
      FROM customer),
    v2 AS (
      SELECT c_custkey AS key,
             md5(concat_ws('|', c_name,
                 CAST(round(CASE WHEN c_custkey % 10 = 3
                                 THEN c_acctbal + 100.0
                                 ELSE c_acctbal END, 2) AS VARCHAR),
                 c_mktsegment)) AS rh
      FROM customer WHERE c_custkey % 7 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, md5('new')
      FROM customer WHERE c_custkey % 11 = 0),
    joined AS (
      SELECT v1.key AS k1, v2.key AS k2, v1.rh AS h1, v2.rh AS h2
      FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key)
    SELECT CASE WHEN k1 IS NULL THEN 'added'
                WHEN k2 IS NULL THEN 'removed'
                WHEN h1 = h2 THEN 'unchanged'
                ELSE 'changed' END AS status,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM joined GROUP BY 1
    """,
)
def snapshot_diff_audit(spark, sf_dir):
    """Table-version reconciliation: diff two snapshots by key +
    row-hash and report added/removed/changed/unchanged counts — the
    replication-audit / migration-signoff primitive (the reference
    validates single rows, src/etl_2018.py:19-31; this validates a
    whole table against another version of itself). One full-outer
    join on the key; ROW CONTENT crosses the shuffle as a 16-byte
    md5, not the actual columns — at 100 TB the diff moves keys and
    hashes only. The second version is derived deterministically
    (every 7th key dropped, every 10th-mod-3 balance shifted, every
    11th key re-added under a new id) so both engines diff identical
    inputs."""
    cust = read_table(spark, sf_dir, "customer")

    def rowhash(bal_expr: str):
        return F.expr(
            "md5(concat_ws('|', c_name,"
            f" CAST(round({bal_expr}, 2) AS STRING), c_mktsegment))"
        )

    v1 = cust.select(
        F.col("c_custkey").alias("key"), rowhash("c_acctbal").alias("rh")
    )
    v2 = cust.filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("key"),
        rowhash(
            "CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100.0"
            " ELSE c_acctbal END"
        ).alias("rh"),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 11 == 0).select(
            (F.col("c_custkey") + 1000000).alias("key"),
            F.md5(F.lit("new")).alias("rh"),
        )
    )
    joined = v1.alias("a").join(
        v2.alias("b"), F.col("a.key") == F.col("b.key"), "full_outer"
    )
    return (
        joined.select(
            F.expr(
                "CASE WHEN a.key IS NULL THEN 'added'"
                " WHEN b.key IS NULL THEN 'removed'"
                " WHEN a.rh = b.rh THEN 'unchanged'"
                " ELSE 'changed' END"
            ).alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "catalog_partition_overwrite",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST((CASE WHEN event_type = 'click'
                                THEN value * 2 ELSE value END)
                               AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def catalog_partition_overwrite(spark, sf_dir):
    """Managed-catalog partitioned table + DYNAMIC PARTITION
    OVERWRITE — the idempotent-backfill primitive: a partitioned
    managed table is created from events once (CTAS), then the
    'click' partition alone is rebuilt with corrected values
    (doubled) via INSERT OVERWRITE under dynamic partitionOverwrite
    mode — only the partitions present in the insert are replaced,
    every other partition's files are untouched. Re-running the
    overwrite is a no-op by construction, which is exactly why daily
    pipeline backfills use this shape (a failed job reruns safely).
    The read-back census hash-matches an oracle that restates the
    correction over the raw table."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"events_pt_{tag}"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if not spark.catalog.tableExists(name):
            from etl_jobs_spark.scratch import scratch_root

            ev = read_table(spark, sf_dir, "events").select(
                "event_id", "value", "event_type"
            )
            (
                ev.write.partitionBy("event_type")
                .mode("overwrite")
                # explicit location: keep table files on scratch, not
                # a spark-warehouse/ dir in whatever CWD the caller has
                .option("path", str(scratch_root() / f"wh_{name}"))
                .saveAsTable(name)
            )
        # the backfill: rebuild ONE partition with corrected values
        read_table(spark, sf_dir, "events").filter(
            F.col("event_type") == "click"
        ).select(
            "event_id", (F.col("value") * 2).alias("value"), "event_type"
        ).write.insertInto(name, overwrite=True)
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                M.dsum("value").alias("total_value"),
            )
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


#: Small-file compaction fixture: staged fragment count and target.
_COMPACT_BEFORE = 48
_COMPACT_AFTER = 8


@register(
    "maintenance_compact_report",
    oracle=f"""
    -- file counts are measured from input_file_name(), which only
    -- sees files CONTAINING rows: an empty table stages and compacts
    -- to zero data files (round-11 empty-input axis)
    SELECT CASE WHEN count(*) = 0 THEN 0
                ELSE {_COMPACT_BEFORE} END AS files_before,
           CASE WHEN count(*) = 0 THEN 0
                ELSE {_COMPACT_AFTER} END AS files_after,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                    || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)
               AS content_hash
    FROM events
    """,
)
def maintenance_compact_report(spark, sf_dir):
    """Small-file compaction as a maintenance job with a verified
    report: events staged as {_COMPACT_BEFORE} fragment files (a
    streaming sink's typical debris), compacted to {_COMPACT_AFTER}
    via sources/writers.compact_parquet (read → repartition →
    crash-safe rename-aside swap), then the compacted table is
    re-scanned to PROVE the rewrite — file counts are measured from
    ``input_file_name()``, rows counted, and an order-insensitive
    ``bit_xor`` content fingerprint computed over the portable 60-bit
    row hash. The oracle states the expected counts as literals and
    recomputes the fingerprint from the ORIGINAL table, so a
    compaction that dropped, duplicated or corrupted any row — or
    produced the wrong file count — turns the driver row red. At
    100 TB this is the nightly job that keeps scan throughput from
    dying of file-open overhead (target ~128 MB-1 GB per file);
    bit_xor makes the integrity check one map-side aggregation with
    an 8-byte carry, no sort, no second copy of the data."""
    from etl_jobs_spark.operators.hashing import hash60
    from etl_jobs_spark.scratch import scratch_dir
    from etl_jobs_spark.sources.writers import compact_parquet

    d = scratch_dir("compact_job")
    path = str(d / "events_frag")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(_COMPACT_BEFORE).write.parquet(path)
    n_before = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    compact_parquet(spark, path, _COMPACT_AFTER)
    h = hash60(
        "concat(cast(event_id as string), ':', cast(user_id as string))",
        "spark",
    )
    return (
        spark.read.parquet(path)
        .withColumn("_file", F.input_file_name())
        .agg(
            F.countDistinct("_file").alias("files_after"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"bit_xor({h})").alias("content_hash"),
        )
        .select(
            F.lit(n_before).cast("int").alias("files_before"),
            F.col("files_after").cast("int"),
            "n_rows",
            "content_hash",
        )
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def mv_incremental_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: a per-(type, day)
    aggregate MV was built from the historical 90% of events and
    MATERIALIZED to parquet; the remaining 10% arrives as today's
    delta batch, is aggregated alone, and is MERGED into the stored
    MV by summing partial states — no rescan of history. The oracle
    recomputes the aggregate from the full table, so the driver row
    proves merge(MV, delta) ≡ recompute — the algebraic property
    (count and sum are commutative monoids) that makes incremental
    refresh sound. Float discipline: the summed measure is integer
    CENTS, so partial-sum merge order cannot drift the value. At
    100 TB this is THE continuous-aggregate pattern: refresh cost
    scales with the delta, the merge is one keyed shuffle of
    MV-rows (tiny) + delta aggregate, and the same plan maintains
    the MV under streaming foreachBatch."""
    from etl_jobs_spark.scratch import scratch_dir

    ev = read_table(spark, sf_dir, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")

    def agg(df):
        return df.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).cast("bigint").alias("value_cents"),
        )

    hist = ev.filter(F.col("event_id") % 10 != 0)
    delta = ev.filter(F.col("event_id") % 10 == 0)
    mv_path = str(scratch_dir("mv_refresh") / "mv")
    agg(hist).write.parquet(mv_path)
    mv = spark.read.parquet(mv_path)
    merged = mv.unionByName(agg(delta))
    return merged.groupBy("event_type", "day").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("value_cents").cast("bigint").alias("value_cents"),
    )


#: Orphan-file fixtures planted by maintenance_vacuum_report: three
#: 1024-byte temp files a crashed writer would leave behind.
_VACUUM_ORPHANS = 3
_VACUUM_ORPHAN_BYTES = 1024


@register(
    "maintenance_vacuum_report",
    oracle=f"""
    -- null event_type is a real partition directory on disk
    -- (__HIVE_DEFAULT_PARTITION__), so the file census must count it;
    -- bare count(DISTINCT) would skip it (string-null differential)
    SELECT CAST(count(DISTINCT coalesce(event_type, '__null__'))
                AS BIGINT) AS n_active_files,
           CAST({_VACUUM_ORPHANS} AS BIGINT) AS n_orphan_files,
           CAST({_VACUUM_ORPHANS * _VACUUM_ORPHAN_BYTES} AS BIGINT)
             AS orphan_bytes,
           CAST(count(*) AS BIGINT) AS n_rows_active
    FROM events
    """,
)
def maintenance_vacuum_report(spark, sf_dir):
    """VACUUM as a maintenance job with a verified report: events
    are laid out as a partitioned table (one file per event_type
    partition), a manifest of live files is captured at write time,
    then a crashed writer is simulated by planting temp files the
    manifest doesn't reference. The vacuum pass lists the physical
    directory, diffs it against the manifest, and reports live-file
    count, orphan count, reclaimable bytes, and the row count of the
    surviving table — the audit artifact produced BEFORE deletion
    (the delete itself is the listed orphan set, a metadata op). The
    oracle pins the expected file/byte numbers and recounts rows
    from the source, so a vacuum that misclassified a LIVE file as
    orphan (or missed a plant) turns the driver row red. At 100 TB
    orphan listing shards by partition prefix and the manifest is a
    table, not a Python set — same diff, distributed."""
    import os

    from etl_jobs_spark.scratch import scratch_dir

    d = scratch_dir("vacuum_job")
    path = str(d / "events_table")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(1).write.partitionBy("event_type").parquet(path)

    def data_files():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                # skip _SUCCESS/_metadata markers, but DO list
                # dot-prefixed debris — that's what vacuum reclaims.
                if f.startswith("_"):
                    continue
                p = os.path.join(root, f)
                out[p] = os.path.getsize(p)
        return out

    manifest = set(data_files())
    # Live DATA files (the .crc checksum companions ride along with
    # their data file — counted as neither live nor orphan).
    n_active = sum(
        1 for p in manifest if not os.path.basename(p).startswith(".")
    )
    for i in range(_VACUUM_ORPHANS):
        # dot-prefixed like a real in-progress Hadoop task file: the
        # table scan ignores it, the vacuum listing must not.
        orphan = os.path.join(
            path, "event_type=click", f".part-crashed-writer-{i}.tmp"
        )
        # a crashed writer mkdirs its task path before dying; on an
        # empty table no partition dir exists yet (round-11
        # empty-input axis)
        os.makedirs(os.path.dirname(orphan), exist_ok=True)
        with open(orphan, "wb") as fh:
            fh.write(b"\xde\xad\xbe\xef" * (_VACUUM_ORPHAN_BYTES // 4))
    listed = data_files()
    orphans = {p: sz for p, sz in listed.items() if p not in manifest}
    live = spark.read.schema(ev.schema).parquet(path)
    return live.agg(F.count(F.lit(1)).alias("n_rows_active")).select(
        F.lit(n_active).cast("bigint").alias("n_active_files"),
        F.lit(len(orphans)).cast("bigint").alias("n_orphan_files"),
        F.lit(sum(orphans.values())).cast("bigint").alias("orphan_bytes"),
        "n_rows_active",
    )


@register(
    "scan_txn_log_snapshot",
    oracle="""
    SELECT 1 AS version, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events WHERE event_id % 3 IN (0, 1)
    GROUP BY event_type
    UNION ALL
    SELECT 2, event_type,
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events WHERE event_id % 3 IN (1, 2)
    GROUP BY event_type
    """,
)
def scan_txn_log_snapshot(spark, sf_dir):
    """Transaction-log table format with TIME TRAVEL — the lakehouse
    primitive (Delta/Iceberg's core mechanic) built from parts: data
    files are immutable parquet, a JSON commit log records
    add/remove file actions per version, and a snapshot at version V
    is resolved by folding the log prefix ≤ V (adds minus removes) —
    readers touch ONLY the live files of their version, never a
    directory listing. Commit 1 adds files A+B; commit 2 removes A
    and adds C (a compaction/GC rewrite); the query reads BOTH
    snapshots (time travel) and reports each version's census. The
    oracle states both snapshots' contents from the original table,
    so a log-fold bug — reading a removed file, missing an add —
    flips the hash. Scale notes: the log is KBs regardless of table
    size (it names files, not rows); snapshot resolution is a
    metadata fold; data reads stay pruned parquet scans of the live
    set. Round 15 added the WRITE side of this protocol —
    optimistic multi-writer commits, exactly-once streaming batches,
    vacuum — as ``sources/txn_log.py`` (`sink_txn_parquet` row);
    this row keeps its hand-built staging so the fold semantics stay
    pinned independently of the writer's code path."""
    import json as _json
    import os

    from etl_jobs_spark.queries._shared import session_memo
    from etl_jobs_spark.scratch import scratch_dir

    cents = F.expr("CAST(round(value * 100) AS BIGINT)")

    def stage():
        d = scratch_dir("txn_log")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        for name, m in (("A", 0), ("B", 1), ("C", 2)):
            ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.parquet(
                str(d / f"data_{name}")
            )
        os.makedirs(d / "_log")
        commits = {
            1: [("add", "data_A"), ("add", "data_B")],
            2: [("remove", "data_A"), ("add", "data_C")],
        }
        for v, actions in commits.items():
            with open(d / "_log" / f"{v:08d}.json", "w") as fh:
                for action, f in actions:
                    fh.write(
                        _json.dumps(
                            {"version": v, "action": action, "file": f}
                        )
                        + "\n"
                    )
        return d

    d = session_memo(spark, "txn_log", sf_dir, stage)
    log = [
        r.asDict()
        for r in spark.read.schema(
            "version INT, action STRING, file STRING"
        )
        .json(str(d / "_log"))
        .collect()
    ]

    def live_files(version: int) -> list[str]:
        live: set[str] = set()
        for e in sorted(log, key=lambda e: e["version"]):
            if e["version"] > version:
                break
            if e["action"] == "add":
                live.add(e["file"])
            else:
                live.discard(e["file"])
        return [str(d / f) for f in sorted(live)]

    def census(version: int):
        snap = spark.read.parquet(*live_files(version))
        return snap.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).cast("bigint").alias("value_cents"),
        ).select(
            F.lit(version).alias("version"),
            "event_type",
            "n_events",
            "value_cents",
        )

    return census(1).unionAll(census(2))


def _er_audit_ctes() -> str:
    """DuckDB CTE text mirroring ``operators.matching.block_cap_audit``
    over the ER pipeline's blocking config (customer names, nation +
    segment conjuncts composed into the key, cap = ER_BLOCK_CAP).

    Dialect mapping, clause by clause: the Spark side explodes
    ``array_union(array(name), transform(sequence(1, len), i ->
    delete_i(name)))`` — array_union DEDUPS within a row (repeated
    characters make identical deletions), hence the DISTINCT over
    (custkey, block attrs, variant); Spark then groups on
    ``xxhash64(variant, nation, segment)`` while the oracle groups on
    the raw tuple — identical up to 64-bit hash collisions (~1e-7 at
    sf0.1 block counts, and a collision could only MERGE two blocks,
    which the correctness sweep would catch loudly). ``capped_pairs``
    uses integer ``//`` here vs double-divide-then-truncate Spark-side;
    n*(n-1) is even so both are exact."""
    cap = MT.ER_BLOCK_CAP
    return f"""
    -- DISTINCT per source ROW (synthetic rid), not per custkey:
    -- Spark's array_union dedups deletions WITHIN one row, and a
    -- duplicate-key row is still a separate record to resolve — a
    -- custkey-level DISTINCT silently merged duplicate rows'
    -- variant occurrences (round-12 duplicate-key axis). The rid is
    -- order-arbitrary but only uniqueness matters.
    base AS (
      SELECT row_number() OVER () AS rid, c_custkey, c_nationkey,
             c_mktsegment, c_name
      FROM customer),
    variants AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, variant FROM (
        SELECT DISTINCT rid, c_custkey, c_nationkey, c_mktsegment,
                        variant
        FROM (
          SELECT rid, c_custkey, c_nationkey, c_mktsegment,
                 c_name AS variant
          FROM base
          UNION ALL
          SELECT rid, c_custkey, c_nationkey, c_mktsegment,
                 substr(c_name, 1, i - 1) || substr(c_name, i + 1)
                   AS variant
          FROM (SELECT rid, c_custkey, c_nationkey, c_mktsegment,
                       c_name,
                       unnest(range(1, length(c_name) + 1)) AS i
                FROM base)))),
    blocks AS (
      SELECT variant, c_nationkey, c_mktsegment, count(*) AS n
      FROM variants GROUP BY 1, 2, 3),
    audit AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN n <= {cap} THEN 1 END), 0)
             AS BIGINT) AS kept_blocks,
        CAST(COALESCE(SUM(CASE WHEN n > {cap} THEN 1 END), 0)
             AS BIGINT) AS capped_blocks,
        CAST(COALESCE(SUM(CASE WHEN n <= {cap} THEN n END), 0)
             AS BIGINT) AS kept_occurrences,
        CAST(COALESCE(SUM(CASE WHEN n > {cap} THEN n END), 0)
             AS BIGINT) AS dropped_occurrences,
        CAST(COALESCE(SUM(CASE WHEN n > {cap}
                          THEN n * (n - 1) // 2 END), 0)
             AS BIGINT) AS capped_pairs
      FROM blocks)"""


def _er_oracle() -> str:
    return f"""
    WITH RECURSIVE
    {_er_audit_ctes()},
    p0 AS (
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
      WHERE levenshtein(a.c_name, b.c_name) <= 1),
    edges(a, b) AS (
      SELECT key_a, key_b FROM p0
      UNION ALL
      SELECT key_b, key_a FROM p0),
    nodes(n) AS (SELECT DISTINCT a FROM edges),
    reach(node, root) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node),
    comp AS (
      SELECT node AS c_custkey, min(root) AS entity_id
      FROM reach GROUP BY node),
    members AS (
      SELECT comp.entity_id, c.c_custkey, c.c_name,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM comp JOIN customer c ON c.c_custkey = comp.c_custkey),
    golden AS (
      SELECT entity_id, c_custkey AS golden_key, c_name AS golden_name
      FROM (
        SELECT entity_id, c_custkey, c_name,
               row_number() OVER (PARTITION BY entity_id
                                  ORDER BY bal_cents DESC,
                                           c_custkey ASC) AS rk
        FROM members)
      WHERE rk = 1)
    SELECT m.entity_id,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(m.bal_cents) AS BIGINT) AS merged_bal_cents,
           max(g.golden_key) AS golden_key,
           max(g.golden_name) AS golden_name,
           max(a.capped_blocks) AS capped_blocks,
           max(a.capped_pairs) AS capped_pairs
    FROM members m JOIN golden g ON g.entity_id = m.entity_id
    CROSS JOIN audit a
    GROUP BY m.entity_id
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST(-1 AS BIGINT), '', a.capped_blocks, a.capped_pairs
    FROM audit a
    """


@register("pipeline_entity_resolution", oracle=_er_oracle())
def pipeline_entity_resolution(spark, sf_dir):
    """END-TO-END ENTITY RESOLUTION — the master-data user story
    composed from the engine's own operators: (1) candidate pairs
    via SymSpell deletion-neighborhood blocking + exact levenshtein
    verify (operators/matching.py — never all-pairs; the oracle IS
    the all-pairs scan, the thing the blocking exists to avoid);
    (2) entity clusters via distributed connected components
    (operators/dedup.py — min-label propagation, verified here
    against the oracle's recursive-CTE reachability) — with a
    CONJUNCTIVE match rule (name edit-distance <= 1 AND same nation
    AND same segment): single-attribute matching over
    serial-numbered names transitively chains the whole table into
    one entity, the over-merge failure multi-attribute rules exist
    to stop; (3) GOLDEN
    RECORD per entity: highest-balance member wins (custkey
    tiebreak), with the merged balance and record census — the
    survivorship rule every MDM pipeline configures. Only clustered
    entities (>= 2 records) report; (4) IN-BAND CAP DISCLOSURE:
    every row carries the blocking cap's ``capped_blocks`` /
    ``capped_pairs`` audit (zero ⇔ the capped plan equals the exact
    one), and a sentinel row (``entity_id = -1``, zero counts)
    carries the same so an EMPTY entity set — the adversarial-skew
    outcome when every block exceeds the cap — still explains
    itself. Scale: blocking bounds pair
    generation, components run on the (tiny) pair graph, and the
    golden-record pass is one window over cluster members."""
    from etl_jobs_spark.operators import dedup as DD
    from etl_jobs_spark.operators import matching as MT
    from pyspark.sql import Window as W

    cust = read_table(spark, sf_dir, "customer")
    # Equality conjuncts (nation, segment) are COMPOSED INTO the
    # deletion-neighborhood blocking key (VERDICT r7 item 2): on a
    # skewed corpus (common names) a name-only block is the classic
    # ER blow-up — splitting every variant block by the conjunct
    # attributes bounds block size by true per-(name, nation,
    # segment) dup density, with identical results (cross-attribute
    # pairs could never satisfy the match rule).
    # block_cap DEFAULT ON (VERDICT r8 item 3): ER_BLOCK_CAP = 12 is
    # >2x the largest honest composed block (5 at sf0.1), so on the
    # fixtures the capped plan returns exactly the uncapped result
    # (the oracle below stays the independent all-pairs scan, and
    # tests/test_round9_ops.py asserts block_cap_audit reads all-zero
    # here). On an adversarial corpus (>12 records on one
    # name-variant+nation+segment key) the cap bounds the quadratic
    # in-block pair blow-up and the recall trade is DISCLOSED by
    # operators.matching.block_cap_audit's capped_pairs column —
    # IN-BAND (VERDICT r9 item 3): every result row carries the
    # audit's capped_blocks/capped_pairs, so an empty or reduced
    # entity set explains itself without running the audit
    # separately (the standalone `er_block_cap_audit` query carries
    # the full five-column breakdown).
    pairs = MT.fuzzy_pairs(
        cust.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        "c_custkey",
        "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        block_cap=MT.ER_BLOCK_CAP,
    ).select("key_a", "key_b")
    comp = DD.connected_components(
        pairs.select(
            F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b")
        )
    ).select(F.col("doc_id").alias("c_custkey"), F.col("component").alias("entity_id"))
    members = comp.join(
        cust.select(
            "c_custkey",
            "c_name",
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias(
                "bal_cents"
            ),
        ),
        "c_custkey",
    )
    golden = (
        members.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("entity_id").orderBy(
                    F.col("bal_cents").desc(), F.col("c_custkey").asc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "entity_id",
            F.col("c_custkey").alias("golden_key"),
            F.col("c_name").alias("golden_name"),
        )
    )
    # In-band cap disclosure (VERDICT r9 item 3): one cheap audit
    # pass (variant explode + groupBy count + single-row aggregate —
    # two keyed shuffles on 8-byte keys) broadcast-joined onto every
    # entity row, PLUS a sentinel row (entity_id = -1, zero counts)
    # that survives even when the cap drops every block — the
    # adversarial-corpus case where the entity set is EMPTY and
    # constant columns alone would disclose nothing.
    audit = MT.block_cap_audit(
        cust.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        "c_custkey",
        "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        block_cap=MT.ER_BLOCK_CAP,
    ).select("capped_blocks", "capped_pairs")
    entities = (
        members.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum("bal_cents").cast("bigint").alias("merged_bal_cents"),
        )
        .join(golden, "entity_id")
        .crossJoin(F.broadcast(audit))
        .select(
            "entity_id",
            "n_records",
            "merged_bal_cents",
            "golden_key",
            "golden_name",
            "capped_blocks",
            "capped_pairs",
        )
    )
    sentinel = audit.select(
        F.lit(-1).cast("bigint").alias("entity_id"),
        F.lit(0).cast("bigint").alias("n_records"),
        F.lit(0).cast("bigint").alias("merged_bal_cents"),
        F.lit(-1).cast("bigint").alias("golden_key"),
        F.lit("").alias("golden_name"),
        "capped_blocks",
        "capped_pairs",
    )
    return entities.unionByName(sentinel)


def _er_audit_oracle() -> str:
    return f"""
    WITH
    {_er_audit_ctes()}
    SELECT kept_blocks, capped_blocks, kept_occurrences,
           dropped_occurrences, capped_pairs
    FROM audit
    """


@register("er_block_cap_audit", oracle=_er_audit_oracle())
def er_block_cap_audit(spark, sf_dir):
    """Standalone disclosure row for the entity-resolution blocking
    cap (VERDICT r9 item 2 — the no-silent-caps rule made
    driver-visible): quantifies what ``ER_BLOCK_CAP`` drops from
    ``pipeline_entity_resolution``'s candidate stage on THIS corpus.
    One row: kept/capped composed (name-variant, nation, segment)
    blocks, their variant-occurrence totals, and ``capped_pairs`` —
    sum of C(n, 2) over over-cap blocks, the upper bound on candidate
    pairs the cap can cost (all zeros ⇔ capped plan ≡ exact plan; on
    the honest fixtures it IS all zeros, asserted across every
    staged sf in tests/test_round10_ops.py). Plan (operators/
    matching.py:176): map-only deletion-variant explode → one
    groupBy(hash).count() → single-row conditional aggregate — two
    keyed shuffles on 8-byte keys, nothing quadratic, identical
    shape at 100 TB."""
    cust = read_table(spark, sf_dir, "customer")
    return MT.block_cap_audit(
        cust.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        "c_custkey",
        "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        block_cap=MT.ER_BLOCK_CAP,
    )
