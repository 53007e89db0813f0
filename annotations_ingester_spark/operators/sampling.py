"""Deterministic corpus splitting & sampling — training-pipeline primitives.

Both operators key every decision on the engine-portable md5 hash of the
row id (functions/hashing.py), never on ``rand()`` or partition order, so:

- the same row lands in the same split/sample on every run, on any cluster
  layout, and in any engine (DuckDB oracles certify exact equality);
- adding rows never reshuffles existing assignments (the property that
  keeps a training set stable as a corpus grows — sampling by ``rand()``
  or ``TABLESAMPLE`` changes history every run);
- no shuffle is needed for split assignment at all (a pure projection),
  and stratified sampling shuffles once on the strata key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from annotations_ingester_spark.functions.hashing import md5_hash64

SPLIT_SALT = "split"
SAMPLE_SALT = "sample"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    out_col: str = "split",
) -> DataFrame:
    """Stable train/val/test assignment: bucket = portable_hash(salt:id)
    mod 100; [0,train) → train, [train,train+val) → val, rest → test.
    A pure projection — Catalyst keeps it with the scan; no shuffle."""
    bucket = F.pmod(
        md5_hash64(F.concat_ws(":", F.lit(SPLIT_SALT), F.col(id_col).cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split_bucket", bucket).withColumn(out_col, split)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per strata combination (fewer when a
    stratum is smaller), chosen by portable-hash order with an id
    tie-break — a deterministic, engine-reproducible 'random' sample.
    One shuffle on the strata key; the per-stratum top-n is a ranked
    window, so no stratum ever materializes on the driver."""
    rk = md5_hash64(
        F.concat_ws(":", F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*strata).orderBy(rk.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )
