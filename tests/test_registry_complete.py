"""Registry completeness guard.

A broken group module must fail loudly rather than silently shrinking the
catalog (VERDICT r2 "What's wrong" item 1). ``plans/queries.py`` imports
every group module without try/except and enforces a floor; this test pins
that behavior plus the queries()/oracle_sql() entry-point contract.
"""

from annotations_ingester_spark.plans.queries import EXPECTED_MIN_QUERIES, REGISTRY


def test_registry_has_expected_minimum():
    assert len(REGISTRY) >= EXPECTED_MIN_QUERIES


def test_every_group_module_contributed():
    # One representative query per group module — losing any module's
    # registrations fails here with a name, not just a count.
    representatives = [
        "s1_scan_doc_ids",  # queries_core
        "pipeline_w1_flat_medcat",  # queries_pipeline
        "minhash_lsh_pairs",  # queries_scale
        "agg_rollup",  # queries_ext
        "bm25_match_ranking",  # queries_search
        "q7_nation_volume",  # queries_tpch2
        "text_gopher_quality_flags",  # queries_llm
    ]
    missing = [r for r in representatives if r not in REGISTRY]
    assert not missing, f"group module registrations missing: {missing}"


def test_entry_point_exposes_full_registry():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    assert set(qs) == set(REGISTRY)
    oracles = mod.oracle_sql()
    # every oracle key must be a registered query
    assert set(oracles) <= set(qs)
