"""stable_checkpoint: local blocks by default, reliable cluster-FS
checkpoints when the session has a checkpoint dir — same results.

The executor-loss caveat on every iterative operator is a real switch
now, so these tests pin both sides: (a) with no checkpoint dir nothing
is written anywhere, (b) with one set, checkpoint FILES appear under it
and the operators' results are bit-identical to the local-mode run.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from parquet_to_postgres_spark.checkpoint import stable_checkpoint
from parquet_to_postgres_spark.llm.dedup import connected_components


def _tree_files(root: str) -> list[str]:
    return [
        os.path.join(d, f)
        for d, _, files in os.walk(root)
        for f in files
    ]


def test_local_mode_writes_no_files(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = stable_checkpoint(spark.range(100).withColumn("x", F.col("id") * 2))
    assert df.count() == 100


def test_reliable_mode_round_trips_identically(spark):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # the suite default
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        sc.setCheckpointDir(d)
        try:
            reliable = {
                (r["node"], r["component"])
                for r in connected_components(pairs).collect()
            }
            files = _tree_files(d)
            assert files, "reliable mode must write checkpoint files"
        finally:
            sc.setCheckpointDir(None)
    assert reliable == local
    assert sc.getCheckpointDir() is None


def test_ann_shared_prep_identical_under_reliable_checkpoint(spark):
    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    queries = emb.where(F.col("vec_id") < 5)

    def canon(df):
        return sorted(
            (r["method"], r["query_id"], r["neighbor_id"],
             repr(r["score"]), r["rank"])
            for r in df.collect()
        )

    local = canon(S.ann_topk_all_methods(corpus, queries, k=5))
    sc = spark.sparkContext
    with tempfile.TemporaryDirectory() as d:
        sc.setCheckpointDir(d)
        try:
            reliable = canon(S.ann_topk_all_methods(corpus, queries, k=5))
        finally:
            sc.setCheckpointDir(None)
    assert reliable == local
