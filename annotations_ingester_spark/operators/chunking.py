"""Training-data shaping operators: chunking, sequence packing, redaction.

- ``chunk_documents``: split each doc into overlapping token windows
  (size/stride) — the standard pre-tokenization chunking for LLM training.
  Pure scan expressions + one explode; chunk arithmetic is integer-only so
  any engine reproduces it exactly.
- ``sequence_packing``: assign docs to fixed-token-budget bins by running
  token count per group (sequential greedy packing — the shuffle-light
  approximation of bin packing used by training pipelines; one window
  shuffle per group key).
- ``redact_text``: regex masking of emails / long digit runs — scan-speed
  scrubbing (patterns restricted to constructs that behave identically in
  Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from annotations_ingester_spark.operators.dedup import (
    _disable_infer_filters_from_generate,
    _tokens_sql,
)

# case-insensitive by character class (RE2/Java-identical — no (?i)
# flag needed): "John.Doe@Example.COM" is as much PII as its
# lowercase form; pii_detection_stats already used this alphabet
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
LONG_NUM_RE = "[0-9]{4,}"


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id``, ``chunk_text``, ``n_tokens``.

    n_chunks = 1 if size <= chunk else floor((size - chunk + stride - 1) /
    stride) + 1 — the final chunk always reaches the last token; chunks
    overlap by ``chunk_tokens - stride``.
    """
    _disable_infer_filters_from_generate(df)
    toks = _tokens_sql(text_col)
    n_chunks = (
        f"CASE WHEN size(_tk) <= {chunk_tokens} THEN 1"
        f" ELSE cast(floor((size(_tk) - {chunk_tokens} + {stride} - 1) / {stride}) as int) + 1 END"
    )
    return (
        df.withColumn("_tk", F.expr(toks))
        .filter(F.size("_tk") > 0)
        .withColumn("_nc", F.expr(n_chunks))
        .select(
            F.col(id_col),
            F.col("_tk"),
            F.explode(F.expr("sequence(0, _nc - 1)")).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(
                f"array_join(slice(_tk, chunk_id * {stride} + 1, {chunk_tokens}), ' ')"
            ).alias("chunk_text"),
            F.expr(
                f"size(slice(_tk, chunk_id * {stride} + 1, {chunk_tokens}))"
            ).cast("long").alias("n_tokens"),
        )
    )


def sequence_packing(
    df: DataFrame,
    token_col: str,
    group_col: str,
    order_col: str,
    budget: int = 8192,
) -> DataFrame:
    """Sequential packing: within each group (ordered deterministically),
    bin = floor(exclusive-running-token-sum / budget). Docs never reorder —
    the plan is one window per group, no driver loop, no quadratic fit."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w) - F.col(token_col)  # exclusive prefix sum
    return df.withColumn("bin", F.floor(cum / budget).cast("long"))


def redact_text(col, mask_email: str = "<EMAIL>", mask_num: str = "<NUM>"):
    """Scrub emails and 4+-digit runs (codegen regexp_replace chain)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, EMAIL_RE, mask_email), LONG_NUM_RE, mask_num)
