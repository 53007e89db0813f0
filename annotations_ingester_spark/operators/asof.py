"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as the *union + ordered window* composition (not a join at
all): tag right rows 0 / left rows 1, union, and for each left row take the
last right payload at-or-before its timestamp via ``last(ignorenulls)``
over a (key, time)-ordered window.

Scale shape: ONE shuffle on the partition key (the window), zero join
amplification, no per-key driver loops — the canonical distributed as-of.
The alternative (`pd.merge_asof` inside applyInPandas) materializes whole
key groups in Python; this stays JVM-side.

Determinism: ties on (ts) are broken by a caller-supplied tiebreak column,
and right rows sort before left rows at equal ts (inclusive "at or
before" semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    tiebreak: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[on] <= left[on]`` within the same ``by`` group (backward
    as-of). Right columns come back prefixed; unmatched rows get NULLs.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    r_payload_cols = [c for c in right.columns if c not in by_cols]
    l_cols = left.columns

    r = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols if c not in by_cols],
    )
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols if c not in by_cols],
    )
    order = [F.col("_t"), F.col("_is_left")]
    if tiebreak is not None:
        order.append(F.coalesce(F.col(f"_l_{tiebreak}"), F.col("_r").getField(tiebreak)))
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in by_cols]
    out_cols += [F.col(f"_l_{c}").alias(c) for c in l_cols if c not in by_cols]
    out_cols += [
        F.col("_match").getField(c).alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return u.filter(F.col("_is_left") == 1).select(*out_cols)


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    max_gap: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Interval/range join: pairs with ``0 < right[on] - left[on] <= max_gap``
    in the same ``by`` group.

    A naive theta-join is O(N²) per key; bucketizing ``on`` into
    ``max_gap``-sized buckets turns it into an equi-join on
    (key, bucket ∈ {b, b+1}) + a residual filter — candidates are only
    neighbors, which is what survives at scale.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    l = left.withColumn("_b", (F.col(on) / max_gap).cast("long")).withColumn(
        "_probe", F.explode(F.array(F.col("_b"), F.col("_b") + 1))
    )
    r = right.withColumn("_probe", (F.col(on) / max_gap).cast("long"))
    r = r.select(
        *[F.col(c) for c in by_cols],
        F.col("_probe"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c not in by_cols],
    )
    joined = l.join(r, on=by_cols + ["_probe"])
    gap = F.col(f"{right_prefix}{on}") - F.col(on)
    return (
        joined.filter((gap > 0) & (gap <= max_gap))
        .drop("_b", "_probe")
    )


def asof_join_multi(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Backward AND forward as-of matches in one partition pass: for each
    left row, the most recent right row at-or-before (``b_``-prefixed
    columns) and the earliest right row at-or-after (``f_``-prefixed),
    both inclusive at equal timestamps, each optionally nulled when its
    gap exceeds ``tolerance``. The nearest-mode pick is one CASE on top.

    Contract: right rows must be unique per (by, on) — pre-aggregate
    duplicates (e.g. ``groupBy(by, on).agg(max(id))``) as the catalog
    queries do; among equal-timestamp right rows the window's pick is
    otherwise order-dependent (the single-direction :func:`asof_join`
    exposes ``tiebreak`` for that case).

    Scale shape: ONE shuffle on the ``by`` key serving two ordered
    windows (ascending for backward, descending for forward — the second
    window re-sorts in place, no second exchange), zero join
    amplification. pd.merge_asof's three directions, distributed.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    r_payload_cols = [c for c in right.columns if c not in by_cols]
    l_cols = left.columns

    r = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("_r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in l_cols
            if c not in by_cols
        ],
    )
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols if c not in by_cols],
    )
    # backward: ascending time, right rows first at equal t (inclusive <=)
    w_b = (
        Window.partitionBy(*by_cols)
        .orderBy(F.asc("_t"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: DESCENDING time — "preceding" rows are later times; right
    # rows still sort first at equal t, so equal-timestamp matches stay
    # inclusive for the >= direction too
    w_f = (
        Window.partitionBy(*by_cols)
        .orderBy(F.desc("_t"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        r.unionByName(l)
        .withColumn("_mb", F.last("_r", ignorenulls=True).over(w_b))
        .withColumn("_mf", F.last("_r", ignorenulls=True).over(w_f))
    )
    mb, mf = F.col("_mb"), F.col("_mf")
    if tolerance is not None:
        mb = F.when(F.col("_t") - mb.getField(on) <= tolerance, mb)
        mf = F.when(mf.getField(on) - F.col("_t") <= tolerance, mf)
    out_cols = [F.col(c) for c in by_cols]
    out_cols += [F.col(f"_l_{c}").alias(c) for c in l_cols if c not in by_cols]
    out_cols += [mb.getField(c).alias(f"b_{c}") for c in r_payload_cols]
    out_cols += [mf.getField(c).alias(f"f_{c}") for c in r_payload_cols]
    return u.filter(F.col("_is_left") == 1).select(*out_cols)
