"""Round-15 probe batch 2: single-task-scan fan-out (spread) candidates.

The interval-join finding: a filtered single-file scan is ONE input
partition, so compute-bound per-row stages and partial aggregates run
on one core.  These probes measure spread() (the repo's opt-in split
compensation) on the remaining heavy queries that feed expensive work
from 1-file scans — with exact row-equality checks where the reshape
could drift.

Usage: python tools/r15_probes2.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.session import get_spark  # noqa: E402
from parquet_to_postgres_spark.tables import Catalog, spread  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("PROBE_REPEAT", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    samples = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{label:44s} {samples} min={min(samples)}")
    return min(samples)


def rows_equal(a, b) -> bool:
    ca = sorted(a.columns)
    canon = lambda df: sorted(  # noqa: E731
        tuple(str(r[c]) for c in ca) for r in df.collect()
    )
    return canon(a) == canon(b)


def probe_span_spread(spark):
    from parquet_to_postgres_spark.llm import dedup as D

    t = Catalog(spark, SF_DIR)

    def mk(docs):
        out = D.dedup_repeated_spans(docs, n=4)
        return out.where(F.col("text") != F.col("__orig")).select(
            "doc_id",
            F.col("text").alias("deduped_text"),
            F.length("text").cast("long").alias("n_chars_after"),
            (F.length("__orig") - F.length("text")).cast("long").alias("n_chars_removed"),
        )

    docs = t.documents.select("doc_id", "text", F.col("text").alias("__orig"))
    sdocs = spread(docs)
    print("equal:", rows_equal(mk(docs), mk(sdocs)))
    timed("span_dedup (current)", lambda: noop(mk(docs)))
    timed("span_dedup spread-input (candidate)", lambda: noop(mk(sdocs)))


def probe_text_metrics_spread(spark):
    from parquet_to_postgres_spark.queries.llm_q import text_metrics
    from parquet_to_postgres_spark.llm import text as X

    t = Catalog(spark, SF_DIR)

    def mk(docs):
        feats = X.quality_features("text")
        feats[0] = feats[0].cast("long")
        feats[1] = F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
        return docs.select(
            "doc_id", "lang", feats[1],
            X.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
            feats[0], *feats[2:],
            X.lang_id("text").alias("lang_pred"),
            X.fingerprint("text").alias("fp"),
        )

    docs = t.documents
    print("equal:", rows_equal(mk(docs), mk(spread(docs))))
    timed("text_metrics (current)", lambda: noop(mk(docs)))
    timed("text_metrics spread (candidate)", lambda: noop(mk(spread(docs))))


def probe_corpus_spread(spark):
    from parquet_to_postgres_spark.llm import text as X
    from pyspark.sql import Window

    t = Catalog(spark, SF_DIR)

    def mk(docs):
        scrubbed = docs.select(
            "doc_id", "lang", "source", X.scrub_pii("text").alias("text")
        )
        cleaned = X.remove_boilerplate_lines(
            scrubbed, max_doc_frac=0.5, min_docs=2, sep=" "
        ).select(
            "doc_id", "lang", "source", X.normalize_text("text").alias("clean_text"),
        )
        w = Window.partitionBy(F.md5("clean_text"))
        return cleaned.select(
            "doc_id", "lang", "source", "clean_text",
            F.length("clean_text").cast("long").alias("n_chars"),
            F.md5("clean_text").alias("dedup_key"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
        )

    docs = t.documents
    print("equal:", rows_equal(mk(docs), mk(spread(docs))))
    timed("corpus_preprocess (current)", lambda: noop(mk(docs)))
    timed("corpus_preprocess spread (candidate)", lambda: noop(mk(spread(docs))))


def probe_funnel_spread(spark):
    from parquet_to_postgres_spark.operators import funnel_counts

    t = Catalog(spark, SF_DIR)
    steps = ["signup", "view", "purchase"]

    def mk(ev):
        return funnel_counts(ev, "user_id", "ts", "event_type", steps)

    ev = t.events
    print("equal:", rows_equal(mk(ev), mk(spread(ev))))
    timed("funnel_counts (current)", lambda: noop(mk(ev)))
    timed("funnel_counts spread (candidate)", lambda: noop(mk(spread(ev))))


def probe_sketches_spread(spark):
    t = Catalog(spark, SF_DIR)

    def mk(ev):
        agg = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.75)").alias("p75"),
        )
        return agg.select(
            "event_type", "n_events", "exact_users",
            (F.abs(F.col("hll_users") - F.col("exact_users"))
             <= 0.10 * F.col("exact_users")).alias("hll_ok"),
            ((F.col("p50_approx") >= F.col("p25"))
             & (F.col("p50_approx") <= F.col("p75"))).alias("p50_ok"),
        )

    ev = t.events
    sev = spread(ev.select("event_type", "user_id", "value"))
    print("equal:", rows_equal(mk(ev), mk(sev)))
    timed("approx_sketches (current)", lambda: noop(mk(ev)))
    timed("approx_sketches spread (candidate)", lambda: noop(mk(sev)))


PROBES = {
    "span_spread": probe_span_spread,
    "text_metrics_spread": probe_text_metrics_spread,
    "corpus_spread": probe_corpus_spread,
    "funnel_spread": probe_funnel_spread,
    "sketches_spread": probe_sketches_spread,
}


def main() -> int:
    spark = get_spark("r15_probes2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    for name in sys.argv[1:] or list(PROBES):
        print(f"== {name} ==")
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
