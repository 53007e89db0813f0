"""Catalog-wide physical-plan audit: every registered query is compiled
and its executed-plan string scanned for scale antipatterns. This is the
mechanical generalization of the hand-picked plan-shape tests — a new
query can't silently ship a row-at-a-time Python UDF or an unintended
cartesian product.
"""

from __future__ import annotations

import pytest

from annotations_ingester_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# queries whose plans legitimately contain a broadcast nested-loop /
# cartesian shape: the documented exactness baselines that broadcast a
# tiny side (brute-force top-k, IVF coarse quantizer, percentile
# threshold), never data×data
CROSS_ALLOWED = {
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "kmeans_lloyd_step",
    "kmeans_two_round_assign",
    # single-row statistic broadcasts (scalar-subquery shape: a 1-row
    # aggregate — corpus avg / global df counts — joined back over the
    # data); the "nested loop" is one comparison per row
    "quality_percentile_filter",
    "q11_important_value",
    "q22_global_sales_opportunity",
    "bm25_match_ranking",
    "tfidf_top_terms",
}

# streaming queries execute on build (availableNow to a memory sink) and
# return the sink table — their plan is audited via their batch twins
STREAMING = {
    "streaming_w1_pipeline",
    "streaming_tumbling_agg",
    "streaming_watermarked_dedup",
    "streaming_stateful_totals",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in REGISTRY.items():
        if name in STREAMING:
            continue
        df = spec.spark(spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_at_a_time_python_udfs(plans):
    """Python execution must be Arrow-batched (MapInPandas / ArrowEvalPython)
    — BatchEvalPython is the 10-100x-slower row-at-a-time path."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_no_unintended_cartesian_products(plans):
    offenders = [
        n
        for n, p in plans.items()
        if n not in CROSS_ALLOWED
        and ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
    ]
    assert not offenders, offenders


def test_every_aggregate_has_partial_phase(plans):
    """Aggregates with functions must show a partial (map-side combine)
    phase — a final-only aggregate ships raw rows across the shuffle.
    Distinct-style aggregates (functions=[]) dedup map-side by
    construction and print identically in both phases, so they're exempt
    from the string check."""
    import re

    offenders = []
    for n, p in plans.items():
        has_fn_agg = re.search(r"functions=\[[^\]]", p)
        if has_fn_agg and "partial_" not in p:
            offenders.append(n)
    assert not offenders, offenders
