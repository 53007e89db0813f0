"""Time-series preparation operators over event streams: regular-grid
gap-filling with last-observation-carried-forward, and rolling-statistic
anomaly flagging.

Both are window-function compositions (no UDFs, no driver loops) whose
state per key is bounded — the shapes that survive a 1000-executor run
over years of telemetry:

- **gap-fill/LOCF**: the dense grid is generated per key with
  ``sequence`` + ``explode`` (rows ∝ key's own time span — never a global
  calendar cross join), observations land on the grid via a left
  equi-join on (key, bucket), and the carry-forward is
  ``last(ignorenulls)`` over an UNBOUNDED PRECEDING row frame — Spark
  evaluates it in one pass per key partition (running state, not a
  re-scan per row).
- **rolling z-score**: mean/variance over a bounded trailing ROW frame
  computed from decimal-exact Σv and Σv² (never stddev_samp over raw
  doubles — a streaming float aggregator's result depends on evaluation
  order and differs across engines in the last ulp; the exact decimal
  sums make the z-score bit-identical in any engine). The frame EXCLUDES
  the current row, so a spike is judged against its past, not itself.

Reference parity: the reference has no time-series surface; these extend
the north-star event-analytics family (windows/sessionization in
plans/queries_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_s",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> DataFrame:
    """Regularize (key, epoch-second, value) observations onto a per-key
    ``bucket_s`` grid spanning that key's [min, max] bucket, averaging
    observations within a bucket (decimal-exact mean, rounded to 6 dp) and
    carrying the last observed bucket value forward across gaps.

    Returns ``(key, bucket_s BIGINT, value_filled DOUBLE, is_gap BOOLEAN)``;
    buckets before a key's first observation cannot be carried into (the
    grid starts at the key's own min, so none exist).
    """
    # floor, not a truncating cast: trunc(-0.5) = 0 would merge
    # pre-epoch observations into the wrong (double-width) bucket
    b = F.floor(F.col(ts_col) / bucket_s).cast("long") * bucket_s
    ev = events.select(F.col(key_col).alias("key"), b.alias("bucket"), F.col(value_col))

    observed = ev.groupBy("key", "bucket").agg(
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double") / F.count("*"),
            6,
        ).alias("v")
    )
    span = ev.groupBy("key").agg(
        F.min("bucket").alias("b_min"), F.max("bucket").alias("b_max")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence(F.col("b_min"), F.col("b_max"), F.lit(int(bucket_s)))
        ).alias("bucket"),
    )

    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(observed, ["key", "bucket"], "left")
    return joined.select(
        F.col("key"),
        F.col("bucket").alias("bucket_s"),
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts_s", "event_id"),
    value_col: str = "value",
    lookback: int = 20,
    min_n: int = 10,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Flag rows whose value deviates ≥ ``z_thresh`` sample standard
    deviations from the mean of the previous ``lookback`` rows of the same
    key (ordered by ``order_cols`` — include a unique id so the frame is
    total). Rows with fewer than ``min_n`` predecessors are never flagged
    (cold start).

    Returns flagged rows only: ``(key, ts_s, event_id, value6, mean_prev,
    z)`` with value/mean/z rounded — all derived from exact decimal Σv and
    Σv² so the flag decision is identical in any engine.
    """
    v6 = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(order_cols[0]),
        F.col(order_cols[1]),
        v6.alias("v6"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    stats = base.select(
        "*",
        F.count("v6").over(w).alias("n"),
        F.sum("v6").over(w).cast("double").alias("s1"),
        F.sum((F.col("v6") * F.col("v6")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var_samp = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - F.lit(1)
    )
    z = (F.col("v6").cast("double") - mean) / F.sqrt(var_samp)
    return (
        stats.filter(F.col("n") >= min_n)
        .withColumn("var_s", var_samp)
        .filter(F.col("var_s") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= z_thresh)
        .select(
            "key",
            order_cols[0],
            order_cols[1],
            F.col("v6").cast("double").alias("value6"),
            F.round(mean, 6).alias("mean_prev"),
            F.round("z", 4).alias("z"),
        )
    )
