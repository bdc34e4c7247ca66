"""Round-15 probe batch 3: stage-level timing for the remaining heavy
queries (minhash family, connected components, ANN, streaming harness).

Each probe isolates one stage of a declared query with the bench's
noop-sink methodology so the wall can be attributed before any reshape
is attempted (guide §1).  Variant probes verify exact row equality
before reporting a time.

Usage: python tools/r15_probes3.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.session import get_spark  # noqa: E402
from parquet_to_postgres_spark.tables import Catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("PROBE_REPEAT", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, repeat=None):
    samples = []
    for _ in range(repeat or REPEAT):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{label:48s} {samples} min={min(samples)}")
    return min(samples)


def release_all(spark, before):
    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        release_rdds,
    )

    sc = spark.sparkContext
    spark.catalog.clearCache()
    release_rdds(sc, persistent_rdd_ids(sc) - before)


def probe_near_dedup_stages(spark):
    """near_dedup_corpus: profiles / pairs+jaccard / CC / final."""
    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        stable_checkpoint,
    )
    from parquet_to_postgres_spark.llm import dedup as D

    t = Catalog(spark, SF_DIR)
    docs = t.documents
    sc = spark.sparkContext

    def stage_profiles():
        before = persistent_rdd_ids(sc)
        noop(D.minhash_profiles(docs, shingle_n=5))
        release_all(spark, before)

    def stage_to_pairs():
        before = persistent_rdd_ids(sc)
        profiles = stable_checkpoint(D.minhash_profiles(docs, shingle_n=5))
        pairs = D.minhash_band_pairs(profiles)
        noop(D.profile_jaccard(profiles, pairs).where(F.col("jaccard") >= 0.8))
        release_all(spark, before)

    def stage_full():
        before = persistent_rdd_ids(sc)
        noop(
            D.near_dedup_corpus(docs, threshold=0.8).select(
                "doc_id", "lang", "source", "n_chars"
            )
        )
        release_all(spark, before)

    timed("near_dedup profiles only", stage_profiles)
    timed("near_dedup profiles+pairs+jaccard", stage_to_pairs)
    timed("near_dedup full (current)", stage_full)


def probe_cc_rounds(spark):
    """How many label-propagation rounds does the fixture graph need,
    and what does each round's pair of jobs cost?"""
    from parquet_to_postgres_spark.checkpoint import (
        persistent_rdd_ids,
        stable_checkpoint,
    )
    from parquet_to_postgres_spark.llm import dedup as D

    t = Catalog(spark, SF_DIR)
    sc = spark.sparkContext
    before = persistent_rdd_ids(sc)
    profiles = stable_checkpoint(D.minhash_profiles(t.documents, shingle_n=5))
    pairs = D.minhash_band_pairs(profiles)
    dup = (
        D.profile_jaccard(profiles, pairs)
        .where(F.col("jaccard") >= 0.8)
        .persist()
    )
    n_pairs = dup.count()
    print(f"dup pairs at {SF_DIR}: {n_pairs}")
    timed("connected_components(dup_pairs)", lambda: noop(D.connected_components(dup)))
    release_all(spark, before)


def probe_ann_stages(spark):
    """ann_topk: prep+checkpoint vs the three family pipelines."""
    from parquet_to_postgres_spark.checkpoint import persistent_rdd_ids
    from parquet_to_postgres_spark.llm import similarity as S

    t = Catalog(spark, SF_DIR)
    emb = t.embeddings
    corpus = emb.where(F.col("vec_id") >= 5)
    queries = emb.where(F.col("vec_id") < 5)
    sc = spark.sparkContext

    def full():
        before = persistent_rdd_ids(sc)
        noop(S.ann_topk_all_methods(corpus, queries, k=10))
        release_all(spark, before)

    def prep_only():
        from parquet_to_postgres_spark.checkpoint import stable_checkpoint

        before = persistent_rdd_ids(sc)
        cprep = stable_checkpoint(
            S._ann_prep(corpus, "vec_id", "embedding", 4, keep=("label",))
        )
        qprep = stable_checkpoint(S._ann_prep(queries, "vec_id", "embedding", 4))
        release_all(spark, before)

    def no_checkpoint():
        before = persistent_rdd_ids(sc)
        noop(
            S.ann_topk_all_methods(corpus, queries, k=10, checkpoint=False)
        )
        release_all(spark, before)

    timed("ann_topk full (current)", full)
    timed("ann_topk prep+checkpoint only", prep_only)
    timed("ann_topk full checkpoint=False", no_checkpoint)


def probe_ivfpq(spark):
    """ivfpq_index_probe: the bench-repeat path (marker hit -> probe)."""
    from parquet_to_postgres_spark.queries.llm_q import ivfpq_index_probe

    timed(
        "ivfpq_index_probe (warm store)",
        lambda: noop(ivfpq_index_probe(spark, SF_DIR)),
    )


def probe_stream_harness(spark):
    """Fixed cost of one availableNow harness run vs the join inside
    stream_stream_join."""
    from parquet_to_postgres_spark.streaming import ops as ST

    def trivial_stream():
        # cheapest possible stateless availableNow run: projection only
        out = ST.run_stream_to_df(
            ST.events_stream(spark, SF_DIR).select("event_id", "user_id"),
            "append",
        )

    def ssj():
        ST.run_stream_to_df(
            ST.stream_stream_click_attribution(
                ST.events_stream(spark, SF_DIR)
            ),
            "append",
        )

    timed("stream harness floor (projection)", trivial_stream)
    timed("stream_stream_join (current)", ssj)


PROBES = {
    "near_dedup_stages": probe_near_dedup_stages,
    "cc_rounds": probe_cc_rounds,
    "ann_stages": probe_ann_stages,
    "ivfpq": probe_ivfpq,
    "stream_harness": probe_stream_harness,
}


def main() -> int:
    spark = get_spark("r15_probes3")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        print(f"--- {n} ---")
        PROBES[n](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
