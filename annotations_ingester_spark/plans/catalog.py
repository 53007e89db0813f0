"""Query catalog registry: named (Spark builder, DuckDB oracle) pairs.

Every operator the engine claims (SURVEY §2 inventory + north-star
extensions) registers here; ``__spark_entry__.py`` exposes the registry to
the driver's correctness gate. Parity rules that keep value-hashes equal
across engines:

- alias every computed column identically on both sides;
- cast Spark's narrow ints to BIGINT (DuckDB's default int width);
- never SUM raw doubles — sum DECIMAL(18,2/6) then cast to DOUBLE
  (deterministic regardless of accumulation order);
- round derived doubles in-query;
- make every ORDER BY/LIMIT and row_number total (tie-break on a key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def utc_label(col, fmt: str = "yyyy-MM-dd HH:mm:ss"):
    """Render a timestamp instant as a UTC wall-clock string regardless of
    ``spark.sql.session.timeZone``: convert to TIMESTAMP_NTZ in UTC first
    (``convert_timezone``), then format — NTZ rendering ignores the session
    zone. Lets window queries be timezone-independent instead of mutating
    session state as a plan-construction side effect."""
    from pyspark.sql import functions as F

    return F.date_format(F.convert_timezone(None, F.lit("UTC"), F.col(col)), fmt)


def events_ts_seconds(ts_dtype: str):
    """Epoch-seconds (BIGINT) expression for the events ``ts`` column,
    adaptive to how the parquet encodes it. The generated testdata has
    shipped two encodings: TIMESTAMP(NANOS) (read as raw INT64 nanos under
    ``nanosAsLong``) and plain TIMESTAMP/TIMESTAMP_NTZ(MICROS). DuckDB twin
    for both: ``floor(epoch(ts))::BIGINT`` — for the NTZ encoding
    ``unix_timestamp`` treats the naive wall clock as UTC, exactly like
    DuckDB's ``epoch``, independent of ``spark.sql.session.timeZone``."""
    from pyspark.sql import functions as F

    if ts_dtype == "bigint":
        return (F.col("ts") / F.lit(1_000_000_000)).cast("long")
    return F.unix_timestamp(F.col("ts"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream table; exposes ``ts_s`` (epoch seconds, BIGINT —
    DuckDB twin: ``floor(epoch(ts))::BIGINT``) alongside the raw column,
    adapting to either historical ``ts`` parquet encoding."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts_s", events_ts_seconds(dict(df.dtypes)["ts"]))


#: DuckDB CTE twin of :func:`daily_cents` — compose as f"WITH {DAILY_CENTS_CTE}, ..."
DAILY_CENTS_CTE = """e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                round(value * 100)::BIGINT AS cents
         FROM events),
       d AS (SELECT day, sum(cents)::BIGINT AS x FROM e GROUP BY day)"""

#: DuckDB CTE twin of :func:`daily_type_counts`
DAILY_TYPE_COUNTS_CTE = """e AS (
         SELECT (floor(epoch(ts))::BIGINT // 86400)::BIGINT AS day,
                event_type
         FROM events),
       d AS (SELECT day,
                    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      ::BIGINT AS x,
                    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      ::BIGINT AS y
             FROM e GROUP BY day)"""


def daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue series ``(day BIGINT, x BIGINT cents)`` — the shared
    input of the time-series statistics family (ACF, CUSUM, seasonal
    indexes, forecast backtest). One map-side-combinable aggregate over
    the event stream, bounded by the date domain and localCheckpoint'ed
    so every consumer branch re-reads the tiny frame, not the scan."""
    from pyspark.sql import functions as F

    return (
        events_table(spark, sf_dir)
        .select(
            F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("x"))
        .localCheckpoint(eager=True)
    )


def daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily paired metric series ``(day, x = clicks, y = purchases)`` —
    the shared input of the rank-correlation family (Spearman, Kendall).
    Same boundedness/checkpoint discipline as :func:`daily_cents`."""
    from pyspark.sql import functions as F

    return (
        events_table(spark, sf_dir)
        .select(
            F.expr("CAST(ts_s DIV 86400 AS BIGINT)").alias("day"), "event_type"
        )
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .localCheckpoint(eager=True)
    )
