"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) covers joins; for
aggregations with pathological hot keys (one document exploding into
millions of annotations, one user producing half the events) the classic
fix is salting: aggregate on (key, salt) first — spreading the hot key
over N partitions — then combine partials per key. Both shuffles move only
aggregate-sized data.

Works for any algebraic aggregate (sum/count/min/max); the helper takes
the partial expression and the combiner.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``(keys, salt)`` then ``keys``.

    ``partial_aggs``: aggregates for phase 1 (aliased).
    ``final_aggs``: builder of phase-2 aggregates over the phase-1 columns
    (e.g. ``lambda: [F.sum("n").alias("n")]``).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs())


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = 16) -> DataFrame:
    """Skew-safe ``count(*)`` per key."""
    return salted_agg(
        df,
        keys,
        [F.count("*").alias("_n")],
        lambda: [F.sum("_n").alias("n")],
        salt_buckets,
    )
