"""Learned-selection + span-dedup scale probe (round 7 additions).

Three measurements over cipher-replica corpora of the sf0.1 documents
table (same replica scheme as tools/dedup_scale_probe.py: copy k>0 runs
``text`` through a per-copy substitution cipher, so copies are distinct
but identically distributed and the label column survives verbatim):

1. **Classifier training** — ``train_quality_classifier`` wall at fixed
   (dim, n_iter) as the corpus grows.  What "passing" looks like:
   ~linear wall in the multiplier.  Per iteration the distributed work
   is one scan of the cached feature table + a groupBy bounded by the
   MODEL size (dim+1 buckets), so the driver-side collect cost is
   CONSTANT across multipliers; only the scan grows.

2. **Scoring throughput** — ``score_quality_pandas`` (zero-shuffle Arrow
   path) vs ``score_quality`` (JVM join + per-doc aggregate) over the
   largest corpus, docs/sec.  Passing: the Arrow path at least keeps
   pace despite the Python boundary, because the join path pays a corpus
   shuffle.

3. **Repeated-span dedup** — ``dedup_repeated_spans`` wall under the two
   regimes the operator meets in production: cipher replicas (constant
   duplicate rate — only natural within-copy repeats duplicate; the
   count-filtered ranking window stays proportional to that rate) and
   VERBATIM replicas (worst case — every span duplicated, removal volume
   ~ corpus).  Passing: ~linear wall in both regimes, with the verbatim
   slope steeper only by the extra covered-position volume, never
   super-linear.

Usage:  python tools/select_probe.py
Env:    SELECT_PROBE_MULTIPLIERS  comma ints over sf0.1, default "1,4,16"
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_to_postgres_spark.llm.classify import (  # noqa: E402
    hashed_ngram_profile,
    importance_log_ratios,
    importance_resample,
    score_importance,
    score_quality,
    score_quality_pandas,
    train_quality_classifier,
)
from parquet_to_postgres_spark.llm.dedup import dedup_repeated_spans  # noqa: E402
from parquet_to_postgres_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ALPHABET = string.ascii_lowercase + string.ascii_uppercase + string.digits
DIM = 1 << 15
N_ITER = 5


def cipher_for_copy(k: int) -> str | None:
    if k == 0:
        return None
    rng = random.Random(0x5E1E + k)

    def perm(s: str) -> str:
        chars = list(s)
        rng.shuffle(chars)
        return "".join(chars)

    return (
        perm(string.ascii_lowercase)
        + perm(string.ascii_uppercase)
        + perm(string.digits)
    )


def replicate(docs, mult: int, verbatim: bool = False):
    parts = []
    for k in range(mult):
        mapping = None if verbatim else cipher_for_copy(k)
        text = (
            F.col("text")
            if mapping is None
            else F.translate(F.col("text"), ALPHABET, mapping)
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    mults = [
        int(m)
        for m in os.environ.get(
            "SELECT_PROBE_MULTIPLIERS", "1,4,16"
        ).split(",")
    ]
    spark = get_spark(app_name="select_probe")
    docs = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text", "lang"
    )

    out: dict = {"sf": 0.1, "dim": DIM, "n_iter": N_ITER, "train": {},
                 "span_cipher": {}, "span_verbatim": {}}

    for mult in mults:
        corpus = replicate(docs, mult).withColumn(
            "label", (F.col("lang") == "en").cast("int")
        )
        corpus = corpus.localCheckpoint()  # isolate build cost from train
        n = corpus.count()
        t0 = time.monotonic()
        model = train_quality_classifier(
            corpus, "label", dim=DIM, n_iter=N_ITER, lr=2.0
        )
        wall = round(time.monotonic() - t0, 2)
        out["train"][mult] = {"docs": n, "wall_sec": wall,
                              "final_loss": round(model.losses[-1], 4)}
        print(f"train x{mult}: {n} docs {wall}s loss={model.losses[-1]:.4f}",
              flush=True)
        if mult == mults[-1]:
            t0 = time.monotonic()
            n_scored = score_quality_pandas(corpus, model).count()
            arrow_s = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            score_quality(corpus, model).count()
            jvm_s = round(time.monotonic() - t0, 2)
            out["score"] = {
                "docs": n_scored,
                "arrow_sec": arrow_s,
                "arrow_docs_per_sec": int(n_scored / arrow_s),
                "jvm_join_sec": jvm_s,
            }
            print(f"score x{mult}: arrow {arrow_s}s jvm {jvm_s}s", flush=True)
            # DSIR over the same corpus: profiles + score + top-k
            t0 = time.monotonic()
            target = corpus.where(F.col("lang") == "en")
            im = importance_log_ratios(
                hashed_ngram_profile(target, dim=DIM, ns=(1, 2)),
                hashed_ngram_profile(corpus, dim=DIM, ns=(1, 2)),
                dim=DIM,
                ns=(1, 2),
            )
            scored = score_importance(corpus, im)
            k = n // 10
            kept = importance_resample(scored, k).count()
            out["dsir"] = {
                "docs": n,
                "kept": kept,
                "wall_sec": round(time.monotonic() - t0, 2),
            }
            print(f"dsir x{mult}: {out['dsir']}", flush=True)
        corpus.unpersist()

    for verbatim, key in ((False, "span_cipher"), (True, "span_verbatim")):
        for mult in mults:
            corpus = replicate(docs, mult, verbatim=verbatim).select(
                "doc_id", "text"
            )
            corpus = corpus.localCheckpoint()
            n = corpus.count()
            t0 = time.monotonic()
            res = dedup_repeated_spans(corpus, n=8)
            kept_chars, orig_chars = res.agg(
                F.sum(F.length("text"))
            ).collect()[0][0], corpus.agg(
                F.sum(F.length("text"))
            ).collect()[0][0]
            wall = round(time.monotonic() - t0, 2)
            out[key][mult] = {
                "docs": n,
                "wall_sec": wall,
                "removed_frac": round(1 - kept_chars / orig_chars, 4),
            }
            print(f"span {key} x{mult}: {out[key][mult]}", flush=True)
            corpus.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
