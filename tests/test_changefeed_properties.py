"""Property tests for the change-data operators: many randomized feeds are
packed into ONE DataFrame (a case_id column keys each scenario) so the
whole battery costs two Spark jobs, then every case is checked against a
pure-Python reference implementation.
"""

from __future__ import annotations

import random

N_CASES = 40


def _random_feed(rng: random.Random, case_id: int):
    """A random per-user observation feed with duplicate timestamps, runs
    of repeated states, and NULL states (a NULL run must stay ONE run —
    the eqNullSafe fix; lag-based change detection would silently merge
    runs through NULLs)."""
    rows = []
    eid = 0
    for user in range(rng.randint(1, 4)):
        t = rng.randint(0, 5)
        for _ in range(rng.randint(1, 12)):
            rows.append((case_id, user, rng.choice(["a", "b", "c", None]), t, eid))
            eid += 1
            t += rng.randint(0, 3)  # 0 → same-ts ties, broken by event id
    return rows


def _scd2_reference(rows):
    """Pure-Python SCD2: collapse runs per (case, user) ordered by
    (ts, event_id)."""
    by_key: dict[tuple, list] = {}
    for case_id, user, state, ts, eid in rows:
        by_key.setdefault((case_id, user), []).append((ts, eid, state))
    out = {}
    for (case_id, user), obs in by_key.items():
        obs.sort()
        intervals = []
        for ts, _eid, state in obs:
            if intervals and intervals[-1]["state"] == state:
                intervals[-1]["n"] += 1
            else:
                intervals.append({"state": state, "from": ts, "n": 1})
        for i, iv in enumerate(intervals):
            nxt = intervals[i + 1]["from"] if i + 1 < len(intervals) else None
            out[(case_id, user, i + 1)] = (iv["state"], iv["from"], nxt, iv["n"])
    return out


def test_scd2_matches_reference_on_random_feeds(spark):
    from pyspark.sql import functions as F

    from annotations_ingester_spark.operators.changefeed import scd2_intervals

    rng = random.Random(20260814)
    rows = []
    for c in range(N_CASES):
        rows.extend(_random_feed(rng, c))
    feed = spark.createDataFrame(
        rows, "case_id long, user_id long, state string, ts_s long, event_id long"
    ).withColumn("key", F.concat_ws("|", "case_id", "user_id"))
    got = {
        (int(r.key.split("|")[0]), int(r.key.split("|")[1]), r.version): (
            r.state,
            r.valid_from,
            r.valid_to,
            r.n_events,
        )
        for r in scd2_intervals(feed, "key", "state", "ts_s", "event_id").collect()
    }
    assert got == _scd2_reference(rows)


def _random_changelog(rng: random.Random, case_id: int):
    base = [(case_id, k, rng.randint(0, 99)) for k in range(rng.randint(0, 6))]
    changes = []
    for seq in range(1, rng.randint(1, 10)):
        k = rng.randint(0, 8)  # may touch existing keys or insert new ones
        op = rng.choice(["U", "U", "I", "D"])
        changes.append((case_id, k, rng.randint(100, 199), seq, op))
    return base, changes


def _replay_reference(base, changes):
    state = {(c, k): v for c, k, v in base}
    for c, k, v, _seq, op in sorted(changes, key=lambda t: t[3]):
        if op == "D":
            state.pop((c, k), None)
        else:
            state[(c, k)] = v
    return set(state.items())


def test_apply_changelog_matches_replay_on_random_logs(spark):
    from annotations_ingester_spark.operators.changefeed import apply_changelog

    rng = random.Random(20260814)
    all_base, all_changes = [], []
    for c in range(N_CASES):
        b, ch = _random_changelog(rng, c)
        all_base.extend(b)
        all_changes.extend(ch)
    base = spark.createDataFrame(all_base, "case_id long, k long, v long")
    changes = spark.createDataFrame(
        all_changes, "case_id long, k long, v long, seq long, op string"
    )
    got = {
        ((r.case_id, r.k), r.v)
        for r in apply_changelog(base, changes, ["case_id", "k"], "seq").collect()
    }
    expected = set()
    for c in range(N_CASES):
        b = [r for r in all_base if r[0] == c]
        ch = [r for r in all_changes if r[0] == c]
        expected |= _replay_reference(b, ch)
    assert got == expected


# --- maintain_agg (IVM) ---------------------------------------------------


def _random_ivm_case(rng: random.Random, case_id: int):
    """A random base table plus a retract/insert delta where every retract
    targets an existing, not-yet-retracted base row (the MERGE-delete
    contract maintain_agg documents)."""
    base = []
    for i in range(rng.randint(1, 15)):
        base.append((case_id, rng.randint(0, 3), rng.randint(-50, 50), i))
    delta = []
    retractable = list(range(len(base)))
    rng.shuffle(retractable)
    for i in retractable[: rng.randint(0, len(base))]:
        _, k, v, _ = base[i]
        delta.append((case_id, k, -1, v))
        base[i] = (*base[i][:3], -1)  # mark retracted for the reference
    for _ in range(rng.randint(0, 10)):
        delta.append((case_id, rng.randint(0, 3), 1, rng.randint(-50, 50)))
    return base, delta


def test_maintain_agg_equals_full_recompute_on_random_deltas(spark):
    """IVM's defining equation, property-tested: base_agg merged with a
    random retract/insert delta must equal the aggregate recomputed from
    scratch over the updated table — for every random case at once."""
    from pyspark.sql import functions as F

    from annotations_ingester_spark.operators.changefeed import maintain_agg

    rng = random.Random(20260814)
    all_base, all_delta = [], []
    for c in range(N_CASES):
        b, d = _random_ivm_case(rng, c)
        all_base.extend(b)
        all_delta.extend(d)

    base = spark.createDataFrame(all_base, "case_id long, k long, v long, tag long")
    base_agg = base.groupBy("case_id", "k").agg(
        F.count("*").cast("long").alias("n"), F.sum("v").cast("long").alias("v")
    )
    delta = spark.createDataFrame(all_delta, "case_id long, k long, sign long, v long")
    got = {
        (r.case_id, r.k): (r.n, r.v)
        for r in maintain_agg(
            base_agg, delta, ["case_id", "k"], "sign", ["v"], count_col="n"
        ).collect()
    }

    # pure-Python recompute over the updated multiset
    updated: dict[tuple, list] = {}
    for case_id, k, v, tag in all_base:
        if tag >= 0:  # not retracted
            updated.setdefault((case_id, k), []).append(v)
    for case_id, k, sign, v in all_delta:
        if sign == 1:
            updated.setdefault((case_id, k), []).append(v)
    expected = {
        key: (len(vs), sum(vs)) for key, vs in updated.items() if vs
    }
    assert got == expected
