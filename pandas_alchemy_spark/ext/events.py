"""Event analytics over the ``events`` table: windowed aggregates and
sessionization in batch (SURVEY.md §2.10 — the reference has no
streaming; the streaming variants live in ..streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table.  The driver's parquet uses nanosecond
    timestamps, which Spark rejects by default (PARQUET_TYPE_ILLEGAL);
    read nanos as long and convert to microsecond timestamps.

    NB the nanosAsLong conf is session-wide and DELIBERATELY left
    set (the lazy read consumes it at execution, after this function
    returns); the engine's own init_db applies the same setting."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integer division: float division loses exactness at ns-epoch
        # magnitude (~1.7e18 > 2^53)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif t == "timestamp_ntz":
        # parquet timestamp[us] without tz surfaces as TIMESTAMP_NTZ;
        # unix_micros & friends need TIMESTAMP.  The session runs UTC,
        # so the cast is value-preserving.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_window_agg(df: DataFrame, ts_col: str = "ts",
                        window: str = "1 hour") -> DataFrame:
    """Per-hour (or arbitrary-width) tumbling window aggregate.
    date_trunc keeps the result SQL-oracle-comparable; the streaming
    twin uses F.window + watermark."""
    units = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}
    if window in units:
        start = F.date_trunc(units[window], F.col(ts_col))
    else:
        # arbitrary fixed widths: epoch floor-bucketing (calendar
        # widths like '1 month' have no constant seconds and raise)
        import re
        m = re.fullmatch(
            r"(\d+)\s*(second|minute|hour|day)s?", window.strip())
        if not m:
            raise ValueError(
                f"unsupported window {window!r}: N second/minute/"
                "hour/day widths only (calendar rules belong to "
                "resample)")
        step = int(m.group(1)) * {"second": 1, "minute": 60,
                                  "hour": 3600, "day": 86400}[m.group(2)]
        start = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step)
    return (df.groupBy(start.alias("window_start"),
                       F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"),
                 F.countDistinct("user_id").alias("n_users")))


def sessionize(df: DataFrame, ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``.  One shuffle (partition by
    user), per-user window sort — the standard scalable formulation."""
    w = Window.partitionBy("user_id").orderBy(ts_col)
    # microsecond gap: unix_timestamp TRUNCATES to whole seconds, so a
    # sub-second overshoot of the gap (1800.5 s) would be classified
    # as the same session while the microsecond-precision oracle
    # starts a new one
    gap = (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp")))
    marked = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000),
               1).otherwise(0))
    sess = marked.withColumn("session_seq", F.sum("__new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .drop("session_seq"))


def top_users_by_value(df: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by total event value with per-type breakdown."""
    totals = (df.groupBy("user_id")
              .agg(F.round(F.sum("value"), 4).alias("total_value"),
                   F.count(F.lit(1)).alias("n_events")))
    # TakeOrderedAndProject first (no global window over every user's
    # total — that shuffles the whole user dimension into one task),
    # then rank the k survivors
    top = totals.orderBy(F.col("total_value").desc(),
                         F.col("user_id").asc()).limit(k)
    w = Window.orderBy(F.col("total_value").desc(),
                       F.col("user_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def cohort_retention(df: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id") -> DataFrame:
    """Cohort/retention matrix: users bucketed by first-active day,
    counted per (cohort_day, day_offset).  Two keyed aggregates + one
    join — all shuffles on user_id/day, no window, no driver state."""
    first = (df.groupBy(user_col)
             .agg(F.min(F.to_date(ts_col)).alias("cohort_day")))
    active = (df.select(user_col, F.to_date(ts_col).alias("day"))
              .distinct())
    j = active.join(first, user_col)
    return (j.groupBy("cohort_day",
                      F.datediff("day", "cohort_day").alias("day_offset"))
            .agg(F.countDistinct(user_col).alias("n_users")))


def funnel(df: DataFrame, steps: list[str], ts_col: str = "ts",
           user_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: per user, the earliest completion time of each
    step GIVEN the previous step was completed strictly earlier
    (classic product-analytics funnel).  Returns per-step completion
    counts.

    ONE shuffle, ONE scan: the sequential stage dependency is encoded
    as chained running-min windows over the same (user, ts) ordering —
    ``valid_k(t) = (type == step_k) AND running_min(valid_{k-1}) < t``
    with a RANGE frame (ties included, strictness via the explicit
    ``< t``).  Equivalence with the join-per-stage form: a step-k
    event at time t qualifies iff the user's earliest valid step-(k-1)
    time t' satisfies t' < t; t' is then visible in the running RANGE
    window at t, and any running-window value < t bounds t' from
    above — so the predicates accept exactly the same rows.  The
    per-user groupBy after the window reuses the window's hash
    partitioning (no second shuffle); the previous formulation joined
    the event scan back once per stage (K scans, K shuffles)."""
    w = (Window.partitionBy("u").orderBy("t")
         .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    cur = df.select(F.col(user_col).alias("u"),
                    F.col(type_col).alias("e"),
                    F.col(ts_col).alias("t"))
    cur = cur.withColumn(
        "__v0", F.when(F.col("e") == steps[0], F.col("t")))
    for k in range(1, len(steps)):
        rk = F.min(F.col(f"__v{k - 1}")).over(w)
        cur = cur.withColumn(
            f"__v{k}",
            F.when((F.col("e") == steps[k]) & (rk < F.col("t")),
                   F.col("t")))
    per_user = cur.groupBy("u").agg(
        *[F.min(f"__v{k}").alias(f"t{k}") for k in range(len(steps))])
    aggs = [F.count(F.col(f"t{k}")).alias(f"n_step{k}")
            for k in range(len(steps))]
    return per_user.agg(*aggs)


def densify_time(df: DataFrame, ts_col: str, freq_seconds: int,
                 by=None, fill: str | None = None,
                 num_partitions: int | None = None) -> DataFrame:
    """Gap-free time grid: left-join an aggregated frame onto the
    complete ``min(ts)..max(ts)`` bucket sequence (per ``by`` group if
    given), so empty buckets appear as rows — pandas
    ``resample().agg().asfreq()`` semantics, which a plain groupBy
    cannot produce (absent buckets simply never group).

    Scale shape: the grid is ``F.sequence`` over the [min, max] epoch
    range — ONE row exploded into range/freq bucket rows (a few
    hundred thousand for years of hourly data, trivially
    repartitionable), crossed with the distinct keys when ``by`` is
    set; the data side joins on (bucket, keys).  ``fill='zero'``
    coalesces the numeric columns to 0 (count-like columns);
    ``fill=None`` leaves nulls for a downstream
    ``ffill``/``interpolate``."""
    keys = [by] if isinstance(by, str) else list(by or [])
    bounds = df.agg(
        F.min(F.unix_timestamp(ts_col)).alias("mn"),
        F.max(F.unix_timestamp(ts_col)).alias("mx")).collect()[0]
    if bounds["mn"] is None:
        return df
    step = int(freq_seconds)
    lo = (bounds["mn"] // step) * step
    hi = (bounds["mx"] // step) * step
    spark = df.sparkSession
    grid = (spark.range(1)
            .select(F.explode(F.sequence(
                F.lit(lo), F.lit(hi), F.lit(step))).alias("__epoch"))
            .select(F.timestamp_seconds(F.col("__epoch"))
                    .alias(ts_col)))
    if num_partitions:
        grid = grid.repartition(num_partitions)
    if keys:
        grid = grid.crossJoin(df.select(*keys).distinct())
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts_col) / F.lit(step)) * step)
    data = df.withColumn(ts_col, bucket)
    if keys:
        # null-safe key equality: a plain equi-join never matches a
        # NULL group key, so NULL-key rows would silently vanish
        # behind their zero-filled grid slice.  Alias both sides:
        # grid and data share df's lineage (self-join ambiguity).
        g = grid.alias("__g")
        d = data.alias("__d")
        cond = F.col(f"__g.{ts_col}") == F.col(f"__d.{ts_col}")
        for k in keys:
            cond = cond & F.col(f"__g.{k}").eqNullSafe(
                F.col(f"__d.{k}"))
        out = g.join(d, cond, "left").select(
            F.col(f"__g.{ts_col}").alias(ts_col),
            *[F.col(f"__g.{k}").alias(k) for k in keys],
            *[F.col(f"__d.{c}") for c in data.columns
              if c != ts_col and c not in keys])
    else:
        out = grid.join(data, on=[ts_col], how="left")
    if fill == "zero":
        num = [f.name for f in out.schema.fields
               if f.dataType.simpleString() in
               ("bigint", "int", "double", "float")]
        for c in num:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
