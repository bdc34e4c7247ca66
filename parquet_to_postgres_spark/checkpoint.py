"""Checkpoint strategy switch: local blocks for dev, reliable files for
clusters — one call site instead of a scattered caveat.

Every iterative / multi-consumer operator here (MinHash profiles, the
shared ANN prep, k-means, connected components) must materialize an
intermediate eagerly: concurrent broadcast subtrees would otherwise
race to recompute it, and per-iteration lineage would grow without
bound.  ``localCheckpoint`` is the right default on a single box, but
its blocks are unreplicated and its lineage is TRUNCATED — losing an
executor on a real cluster kills the job with no recompute path.

:func:`stable_checkpoint` keeps the decision in one place: if the
session has a checkpoint directory configured
(``sc.setCheckpointDir(<durable path>)`` — do this in cluster deploy
code), intermediates go through reliable ``checkpoint()`` onto the
cluster FS and survive executor loss; otherwise the local fast path is
used.  Operators call this helper and inherit the right behavior from
session configuration alone.

Cluster notes: set ``spark.cleaner.referenceTracking.cleanCheckpoints``
to ``true`` so reliable checkpoint files are deleted when their
DataFrames are garbage-collected; otherwise clean the checkpoint dir
between jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage, durably if possible.

    Reliable ``checkpoint()`` when the SparkContext has a checkpoint
    dir, ``localCheckpoint()`` otherwise.  ``eager`` defaults to True —
    all call sites here need the materialization barrier (racing
    broadcast consumers / iteration-convergence counts)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        if eager:
            # Reliable eager checkpoint runs TWO jobs over the subtree
            # (the materialization count and the checkpoint-file write).
            # Persist first so the second job reads cached blocks instead
            # of recomputing the whole subtree — Spark's documented
            # checkpoint recipe — then drop the scratch blocks: once the
            # files exist the cache was only a recompute shield.
            from pyspark.storagelevel import StorageLevel

            df.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                return df.checkpoint(eager=True)
            finally:
                df.unpersist(False)
        # Non-eager: the write job fires at an unknown future action, so
        # there is no safe unpersist point here — callers wanting the
        # recompute shield should persist/unpersist around that action.
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=eager)


def persistent_rdd_ids(sc) -> set[int]:
    """IDs of the RDDs currently pinned in the block manager."""
    return {
        int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()
    }


def release_rdds(sc, ids: set[int]) -> None:
    """Release specific persisted RDDs by id (non-blocking).

    ``DataFrame.unpersist`` only clears cache-manager entries, not the
    block-manager storage a ``localCheckpoint`` pins, so superseded
    checkpoints must be released through the RDD registry — iterative
    operators do this per round (``connected_components``), and batch
    harnesses that run many checkpointing queries in one session
    (bench.py) snapshot-and-release around each query."""
    if not ids:
        return
    for entry in sc._jsc.getPersistentRDDs().entrySet().toArray():
        if int(entry.getKey()) in ids:
            entry.getValue().unpersist(False)
