"""Market-basket association mining: co-occurrence pairs with
support / confidence / lift.

The classic frequent-itemset primitive over (basket, item) facts — here
(order, part) from lineitem. At training-data scale the same shape powers
tag co-occurrence and document-source affinity analyses.

Scale shape: the pair expansion is a self-equi-join on the basket key, so
cost is Σ basket_size² — governed by basket size (TPC-H baskets hold ≤ 7
items), NOT corpus size; it never goes all-pairs across baskets. Item
counts are broadcast back onto the pair aggregate (the distinct-item dim
is vocabulary-sized, small relative to facts). Top-k by pair count is
orderBy+limit → TakeOrderedAndProject, a partial top-k per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def market_basket_pairs(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` item pairs by co-occurrence count →
    ``(item_a, item_b, n_pair, support, confidence_ab, lift)`` with
    item_a < item_b, support = n_pair/n_baskets,
    confidence_ab = n_pair/n(item_a), lift = confidence_ab/(n(item_b)/N).
    Deterministic order: n_pair desc, item_a, item_b."""
    items = facts.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    # Corpus stat as a broadcast 1-row aggregate, not a driver-side
    # .count() — plan construction must not trigger jobs.
    n_baskets = items.agg(
        F.count_distinct("_b").cast("double").alias("n_baskets")
    )
    item_counts = items.groupBy("_i").agg(F.count("*").cast("double").alias("n_item"))
    a = items.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = items.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, on="_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_pair"))
    )
    ca = item_counts.select(F.col("_i").alias("item_a"), F.col("n_item").alias("n_a"))
    cb = item_counts.select(F.col("_i").alias("item_b"), F.col("n_item").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_baskets"), 8).alias("support"),
            F.round(F.col("n_pair") / F.col("n_a"), 6).alias("confidence_ab"),
            F.round(
                F.col("n_pair") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("n_pair").desc(), F.col("item_a"), F.col("item_b")
    ).limit(top_k)
