"""Shared plumbing for iterative driver-side loops (CC, k-means fit).

``Dataset.localCheckpoint(eager=True)`` truncates lineage by persisting
the computed partition blocks as an *internal* cached RDD. Calling
``DataFrame.unpersist()`` on the returned frame does NOT release those
blocks — they belong to the checkpoint RDD, not to a CacheManager entry —
so an O(log n) loop that checkpoints every round accumulates one full
copy of its working set per round in executor storage for the lifetime of
the job (round-3 advice, cluster.py). On a 100 TB-scale edge set that is
the difference between a bounded footprint and an eviction storm.

``CheckpointCycler`` fixes this by snapshotting the persistent-RDD id set
around each checkpoint and unpersisting the ids the *previous* round
introduced once the new round's blocks are materialized — at most two
generations are ever live, and the final generation is deliberately kept
(localCheckpoint is unreliable: freeing blocks a lazily-evaluated result
still depends on would make it unrecomputable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CheckpointCycler:
    """Round-to-round localCheckpoint storage manager for iterative loops."""

    def __init__(self, spark: SparkSession):
        self._jsc = spark.sparkContext._jsc
        self._gens: list[set[int]] = []

    def _live_ids(self) -> set[int]:
        return {int(i) for i in self._jsc.getPersistentRDDs().keySet().toArray()}

    def checkpoint(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """localCheckpoint ``df`` and track the blocks it creates.
        Does NOT free older generations — the caller may still read them
        (e.g. old-vs-new centroid shift); call :meth:`retire_previous`
        once every read of the older generations has executed.

        ``eager=False`` registers the checkpoint RDD (persist happens at
        the localCheckpoint call, so the id is tracked here) but defers
        materialization to the caller's next FULL-pass action — the CC
        loop fuses its convergence aggregate with the materialization
        this way, one job per round instead of two. The caller owns the
        obligation that its first action over the frame touches EVERY
        partition (a global aggregate does; a limit/isEmpty probe does
        not and leaves partitions uncached for later consumers to race
        on — the measured r12 negative)."""
        before = self._live_ids()
        out = df.localCheckpoint(eager=eager)
        self._gens.append(self._live_ids() - before)
        return out

    def retire_previous(self) -> None:
        """Free every tracked generation except the newest. Only call once
        all reads of the older generations have executed — freed blocks
        cannot be recomputed (localCheckpoint truncates lineage)."""
        while len(self._gens) > 1:
            self._release(self._gens.pop(0))

    def _release(self, ids: set[int]) -> None:
        jmap = self._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
