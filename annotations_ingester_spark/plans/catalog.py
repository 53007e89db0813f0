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
