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


def _entry_module():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_point_exposes_full_registry():
    mod = _entry_module()
    qs = mod.queries()
    assert set(qs) == set(REGISTRY)
    oracles = mod.oracle_sql()
    # every oracle key must be a registered query
    assert set(oracles) <= set(qs)


# --- Gate-window contract (r5 lesson made executable, not tribal) ---------
#
# The driver certifies only the FIRST 50 entries of queries() per round.
# These tests pin the rotation mechanics: every queued name must actually
# exist (a typo in _QUEUED_LATE would silently strand a query forever),
# and the front of the window must be exactly the not-yet-covered names —
# oldest debt first — so no registration-order accident can displace a
# planned certification.

GATE_WINDOW = 50


def test_queued_late_names_exist_in_registry():
    mod = _entry_module()
    stranded = mod._QUEUED_LATE - set(REGISTRY)
    assert not stranded, f"_QUEUED_LATE names not in registry: {sorted(stranded)}"


def test_deferred_names_exist_in_registry():
    # a typo here would leave the intended query INSIDE the window,
    # displacing the round's planned certification set — the exact
    # failure the deferral mechanism exists to prevent
    mod = _entry_module()
    stranded = mod._DEFERRED_PAST_WINDOW - set(REGISTRY)
    assert not stranded, (
        f"_DEFERRED_PAST_WINDOW names not in registry: {sorted(stranded)}"
    )


def test_order_last_r10_names_exist_in_registry():
    mod = _entry_module()
    stranded = mod._ORDER_LAST_R10 - set(REGISTRY)
    assert not stranded, f"_ORDER_LAST_R10 names not in registry: {sorted(stranded)}"


def test_order_last_r11_names_exist_in_registry():
    mod = _entry_module()
    stranded = mod._ORDER_LAST_R11 - set(REGISTRY)
    assert not stranded, f"_ORDER_LAST_R11 names not in registry: {sorted(stranded)}"


def test_order_last_r12_names_exist_and_fit_window():
    mod = _entry_module()
    stranded = mod._ORDER_LAST_R12 - set(REGISTRY)
    assert not stranded, f"_ORDER_LAST_R12 names not in registry: {sorted(stranded)}"
    assert len(mod._ORDER_LAST_R12) <= 50


def test_order_last_r13_names_exist_and_debt_fits_one_window():
    """r11 verdict item 1: r12-session additions are capped so the 24-name
    r12 tier PLUS everything new fits one 50-slot gate window — official
    coverage reaches 100% at the r12 gate, with nothing stranded."""
    mod = _entry_module()
    stranded = mod._ORDER_LAST_R13 - set(REGISTRY)
    assert not stranded, f"_ORDER_LAST_R13 names not in registry: {sorted(stranded)}"
    assert len(mod._ORDER_LAST_R12 | mod._ORDER_LAST_R13) <= GATE_WINDOW, (
        f"r12 debt ({len(mod._ORDER_LAST_R12)}) + r12-session additions "
        f"({len(mod._ORDER_LAST_R13)}) exceed the {GATE_WINDOW}-slot window"
    )


def test_all_uncovered_fit_one_gate_window():
    """The round-12 discipline: EVERY not-yet-officially-covered name must
    fit one gate window, so the next CORRECTNESS file can close coverage
    to 100%. Any session adding more names than the window's remainder
    breaks this loudly instead of silently re-opening a multi-round tail."""
    mod = _entry_module()
    covered = mod._covered_from_disk()
    uncovered = [n for n in REGISTRY if n not in covered]
    assert len(uncovered) <= GATE_WINDOW, (
        f"{len(uncovered)} uncovered queries exceed the {GATE_WINDOW}-slot "
        f"gate window: {sorted(uncovered)[:10]}..."
    )


def test_order_last_r11_fits_one_gate_window():
    """The r11 tier must certify in ONE 50-slot gate window (its header
    comment claims exactly 50) — a 51st addition belongs in a new
    _ORDER_LAST_R12 tier, not here."""
    mod = _entry_module()
    assert len(mod._ORDER_LAST_R11) == 50, (
        f"r11 tier holds {len(mod._ORDER_LAST_R11)} names; the gate window "
        "certifies 50/round — open an _ORDER_LAST_R12 tier for overflow"
    )


def test_gate_window_fronts_uncovered_debt_then_fresh():
    mod = _entry_module()
    covered = mod._covered_from_disk()
    ordered = list(mod.queries())
    uncovered = [n for n in REGISTRY if n not in covered]
    last13 = [n for n in uncovered if n in mod._ORDER_LAST_R13]
    last12 = [
        n
        for n in uncovered
        if n in mod._ORDER_LAST_R12 and n not in mod._ORDER_LAST_R13
    ]
    last11 = [
        n
        for n in uncovered
        if n in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    last10 = [
        n
        for n in uncovered
        if n in mod._ORDER_LAST_R10
        and n not in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    last = [
        n
        for n in uncovered
        if n in mod._ORDER_LAST
        and n not in mod._ORDER_LAST_R10
        and n not in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    debt = [
        n
        for n in uncovered
        if n in mod._QUEUED_LATE
        and n not in mod._ORDER_LAST
        and n not in mod._ORDER_LAST_R10
        and n not in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    deferred = [
        n
        for n in uncovered
        if n in mod._DEFERRED_PAST_WINDOW
        and n not in mod._QUEUED_LATE
        and n not in mod._ORDER_LAST
        and n not in mod._ORDER_LAST_R10
        and n not in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    fresh = [
        n
        for n in uncovered
        if n not in mod._QUEUED_LATE
        and n not in mod._DEFERRED_PAST_WINDOW
        and n not in mod._ORDER_LAST
        and n not in mod._ORDER_LAST_R10
        and n not in mod._ORDER_LAST_R11
        and n not in mod._ORDER_LAST_R12
        and n not in mod._ORDER_LAST_R13
    ]
    # debt first, then fresh additions, then past-window deferrals, then
    # the absolute-last tiers (r9 then r10), then covered — as sets per
    # segment
    n_front = len(debt) + len(fresh)
    n_unc = len(uncovered)
    assert set(ordered[: len(debt)]) == set(debt)
    assert set(ordered[:n_front]) == set(debt) | set(fresh)
    assert set(ordered[n_front : n_front + len(deferred)]) == set(deferred)
    n_def = n_front + len(deferred)
    assert set(ordered[n_def : n_def + len(last)]) == set(last)
    n_l = n_def + len(last)
    assert set(ordered[n_l : n_l + len(last10)]) == set(last10)
    n_l10 = n_l + len(last10)
    assert set(ordered[n_l10 : n_l10 + len(last11)]) == set(last11)
    n_l11 = n_l10 + len(last11)
    assert set(ordered[n_l11 : n_l11 + len(last12)]) == set(last12)
    assert set(ordered[n_l11 + len(last12) : n_unc]) == set(last13)
    assert set(ordered[n_unc:]) <= covered
    # everything except the r11 head-start tier (debt + r9 tier + r10
    # additions) must fit inside one certification window — the r9
    # verdict's item 1: all 34 older names certify this round, r10
    # additions are capped at the spare slots, and late r11-tier builds
    # ride BEHIND the window (they certify next round)
    assert n_unc - len(last11) - len(last12) - len(last13) <= GATE_WINDOW, (
        f"{n_unc - len(last11) - len(last12) - len(last13)} pre-r11 "
        f"uncovered queries exceed the {GATE_WINDOW}-entry gate window"
    )
    # every NON-DEFERRED uncovered name must fit inside the certification
    # window; overflow means deferring the newest additions (or waiting a
    # round) — and deferrals must sit OUTSIDE the window so they can never
    # displace the round's planned certification set
    assert n_front <= GATE_WINDOW, (
        f"{n_front} front-of-window queries exceed the {GATE_WINDOW}-entry "
        f"gate window; defer the newest additions via _DEFERRED_PAST_WINDOW"
    )


def test_covered_from_disk_floor():
    # The union of green CORRECTNESS rows can only grow; 150 names were
    # certified through r05. A parsing regression in _covered_from_disk
    # would resurface certified names into the window and displace debt.
    mod = _entry_module()
    assert len(mod._covered_from_disk()) >= 150


def test_no_stale_registry_counts_in_docs():
    # Hand-typed registry totals drifted from the live registry twice
    # (r5: 159-vs-163; r6: COVERAGE.md 177-vs-179, gate note 163-vs-179).
    # The numerals were removed; this test keeps them out: any "N/N
    # hash-matched" or "N queries hash-match" claim reappearing in the
    # two docs must equal the live registry size.
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    pat = re.compile(
        r"(\d{2,4})\s*/\s*\1\s+hash-match|(\d{2,4})\s+queries\s+hash-match"
    )
    for doc in ("COVERAGE.md", "__spark_entry__.py"):
        text = (root / doc).read_text()
        for m in pat.finditer(text):
            claimed = int(m.group(1) or m.group(2))
            assert claimed == len(REGISTRY), (
                f"{doc} claims {claimed} certified queries but the registry "
                f"holds {len(REGISTRY)} — derive the number or drop it"
            )


def test_latest_parity_sweep_covers_full_registry():
    """VERDICT r10 item 2: the round-close full-registry parity sweep
    must live in a committed PARITY_SWEEP_r{N}.json artifact, and every
    registry name must appear in the latest one with zero failures —
    so a memory-less judge can verify the uncertified tail from the
    artifact instead of re-running 385 queries. tools/parity.py --emit
    merges incrementally, so adding an operator and running parity on
    it keeps this green without a full re-sweep."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweeps = sorted(glob.glob(os.path.join(root, "PARITY_SWEEP_r*.json")))
    assert sweeps, "no PARITY_SWEEP_r{N}.json artifact committed"
    with open(sweeps[-1]) as f:
        art = json.load(f)
    names = set(art["queries"])
    missing = set(REGISTRY) - names
    assert not missing, (
        f"{len(missing)} registry names missing from {os.path.basename(sweeps[-1])} "
        f"(run `python tools/parity.py /root/testdata/sf0.01 <names> --emit "
        f"{os.path.basename(sweeps[-1])}`): {sorted(missing)[:10]}"
    )
    stale = names - set(REGISTRY)
    assert not stale, f"sweep artifact holds non-registry names: {sorted(stale)[:10]}"
    failed = [n for n, r in art["queries"].items() if r["status"] == "fail"]
    assert not failed, f"sweep artifact records failures: {failed}"
