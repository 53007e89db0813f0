"""Change-data primitives: SCD type-2 history build, changelog apply
(MERGE INTO semantics), and snapshot diffing.

The reference's W3 same-index merge is a point-in-time upsert into a live
store (es_common.py:273-292 bulk update); a lakehouse ingest needs the
batch twins of that operation over immutable snapshots:

- ``scd2_intervals``: collapse an ordered change feed into type-2
  dimension rows (one row per contiguous run of a state, with
  ``valid_from`` / ``valid_to`` and a per-key version counter).
- ``apply_changelog``: replay a keyed changelog (insert/update/delete with
  monotone sequence numbers) onto a base snapshot — latest sequence wins,
  deletes drop the key. This is MERGE INTO re-expressed as one shuffle.
- ``snapshot_diff``: full-outer reconcile of two snapshots of the same
  table into added/removed/changed/unchanged classes — the migration
  validation companion to integrity_table_checksum.

Scale shape: each primitive is a single hash shuffle on the business key
(window or aggregate) — no driver-side state, no iteration. At 100 TB the
key shuffle is the unavoidable cost of keyed semantics; everything else is
map-side. Skewed hot keys are AQE territory (same story as any groupBy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    feed: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 dimension build from an ordered change feed.

    Rows of ``feed`` are observations ``(key, state, ts)``; output is one
    row per contiguous run of an unchanged state per key:
    ``(key, version, state, valid_from, valid_to, n_events)`` with
    ``valid_to`` NULL on the current (open) interval. Ordering is made
    total with ``tiebreak_col`` so runs are engine-portable.

    One shuffle on ``key_col``; the lag/run-id/lead windows and the run
    aggregate all reuse that partitioning.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    # row_number()==1 marks the first observation (lag(state).isNull() can't:
    # it conflates "no previous row" with "previous state was NULL"), and
    # eqNullSafe keeps a run of NULL states as ONE run instead of silently
    # merging distinct runs through NULL comparisons.
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.col(state_col).eqNullSafe(F.lag(state_col).over(w))
    ).cast("long")
    runs = feed.withColumn(
        "version", F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grouped = runs.groupBy(key_col, "version").agg(
        # state is constant within a run; min() (not first()) keeps the
        # aggregate deterministic and engine-portable
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy(F.col("version").asc())
    return grouped.withColumn("valid_to", F.lead("valid_from").over(wv)).select(
        key_col, "version", "state", "valid_from", "valid_to", "n_events"
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE INTO semantics over immutable snapshots: union the base
    (treated as sequence-0 inserts) with a changelog carrying ``op_col``
    in {I,U,D} and a monotone ``seq_col``; keep the latest sequence per
    key; drop keys whose final operation is a delete.

    ``base`` must carry the same columns as ``changes`` minus
    (``seq_col``, ``op_col``) — they are synthesized as (0, 'I').
    One shuffle on the key; the per-key winner is a row_number window over
    that partitioning (bounded by changelog depth per key, not table size).
    """
    base_cl = base.withColumn(seq_col, F.lit(0).cast("long")).withColumn(
        op_col, F.lit("I")
    )
    all_rows = base_cl.unionByName(changes)
    # Deterministic winner even under pathological inputs (a changelog row
    # with seq<=0 tying the synthesized base row, or duplicate seqs per
    # key): after seq desc then op desc, break remaining ties with ONE
    # synthesized comparison. Each value column encodes PREFIX-FREE as
    # 'n' (NULL) or 'v' || md5(cast) — per-column hashing makes the
    # concatenated pre-image unambiguous (a raw separator scheme is not:
    # a literal NUL value collides with the NULL sentinel, and values
    # containing the separator can shift across column boundaries), then
    # one outer md5 yields a single short comparison. A string-cast
    # handles ANY column type — including maps and nested maps, which
    # Spark rejects as window ORDER BY keys. The identical expression is
    # mirrored into the DuckDB oracle (parity-symmetry rule), so for
    # value columns whose string casts agree across engines (all
    # primitive types) the same winner emerges across runs,
    # partitionings, and engines. Rows identical on every value column
    # hash identically and are interchangeable.
    value_cols = [
        c for c in all_rows.columns if c not in (*key_cols, seq_col, op_col)
    ]
    tiebreak = F.md5(
        F.concat(
            *[
                F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                    F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
                )
                for c in value_cols
            ]
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc(), tiebreak.asc()
    )
    latest = (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col(op_col) != delete_op)


def maintain_agg(
    base_agg: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sign_col: str,
    measure_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental view maintenance for a count/sum materialized aggregate
    under a retractable changelog (the Flink-style retract stream): each
    ``delta`` row carries ``sign_col`` ∈ {+1, -1} (insert / retract) and
    the measure columns of the underlying row. The maintained view is

        base_agg ⊎ Σ_delta(sign, sign·measure)   filtered to count > 0

    — exactly equal to recomputing the aggregate over the updated table,
    at a cost proportional to the DELTA: one group-key shuffle of the
    changelog, then a merge with the (already materialized) aggregate.
    At 100 TB this is the difference between touching a day's changes
    and re-scanning the corpus. ``base_agg`` must carry ``count_col``
    plus one summed column per measure (same names as ``measure_cols``).
    Counts cannot go negative if retractions only retract existing rows
    (caller contract — the same contract MERGE INTO deletes have).

    Measures must be EXACT INTEGERS (the catalog's integer-cents
    discipline): sums are carried as BIGINT, which is what makes
    retract arithmetic drift-free — a float measure would both truncate
    here and violate the exact-cancellation property IVM relies on
    (+x then -x must restore the previous sum bit-for-bit)."""
    delta_agg = delta.groupBy(*key_cols).agg(
        F.sum(sign_col).cast("long").alias(count_col),
        *[
            F.sum(F.col(sign_col) * F.col(c)).cast("long").alias(c)
            for c in measure_cols
        ],
    )
    merged = base_agg.unionByName(delta_agg)
    return (
        merged.groupBy(*key_cols)
        .agg(
            F.sum(count_col).cast("long").alias(count_col),
            *[F.sum(c).cast("long").alias(c) for c in measure_cols],
        )
        .filter(F.col(count_col) > 0)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots as added / removed /
    changed / unchanged and return the per-class summary
    ``(change_type, n, key_checksum)`` — ``key_checksum`` is the exact
    integer sum of the first key column per class, so a hash match
    certifies the exact membership of each class, not just its size.

    ``compare_cols`` must be exact-typed (ints, strings, decimals) —
    callers round floating-point measures first. Full-outer equi-join on
    the key (one shuffle), then a 4-group aggregate.
    """
    k0 = key_cols[0]

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(c) for c in key_cols]
        cols.append(F.struct(*[F.col(c) for c in compare_cols]).alias(f"_v_{tag}"))
        return df.select(*cols)

    joined = side(old, "old").join(side(new, "new"), on=list(key_cols), how="full_outer")
    change_type: Column = (
        F.when(F.col("_v_old").isNull(), F.lit("added"))
        .when(F.col("_v_new").isNull(), F.lit("removed"))
        .when(F.col("_v_old") != F.col("_v_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(change_type.alias("change_type"), F.col(k0))
        .groupBy("change_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(k0).cast("long").alias("key_checksum"),
        )
    )
