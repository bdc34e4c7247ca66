"""Learned data selection: fastText-style classifier + DSIR resampling."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_to_postgres_spark.llm.classify import (
    ImportanceModel,
    feature_ids,
    featurize,
    hashed_ngram_profile,
    importance_log_ratios,
    importance_resample,
    importance_resample_by,
    score_importance,
    score_quality,
    score_quality_pandas,
    sql_feature_ids,
    sql_importance_logw,
    train_quality_classifier,
)
from parquet_to_postgres_spark.llm.text import LM_SCALE
from parquet_to_postgres_spark.tables import load_table

from .conftest import SF_SMOKE

DIM = 1 << 12


def _py_feat(tok: str, dim: int = DIM) -> int:
    """Python twin of feature_ids for a single token (md5 60-bit % dim)."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def _labeled_corpus(spark, n_per_class: int = 40):
    good_vocab = ["clear", "prose", "reads", "well", "with", "structure"]
    spam_vocab = ["buy", "now", "click", "free", "winner", "offer"]
    rows = []
    for i in range(n_per_class):
        g = " ".join(good_vocab[(i + j) % len(good_vocab)] for j in range(8))
        s = " ".join(spam_vocab[(i + j) % len(spam_vocab)] for j in range(8))
        rows.append((2 * i, g, 1))
        rows.append((2 * i + 1, s, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_featurize_literal(spark):
    df = spark.createDataFrame(
        [(1, "The the cat"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["features"]
        for r in featurize(df, dim=DIM).collect()
    }
    # doc 1: tokens [the, the, cat] -> the x=2/3, cat x=1/3, + bias
    f1 = {r["feat"]: r["x"] for r in out[1]}
    assert f1[_py_feat("the")] == pytest.approx(2 / 3)
    assert f1[_py_feat("cat")] == pytest.approx(1 / 3)
    assert f1[DIM] == 1.0 and len(f1) == 3
    # features sorted by feat id
    assert [r["feat"] for r in out[1]] == sorted(r["feat"] for r in out[1])
    # whitespace-only and NULL text -> bias only
    assert [(r["feat"], r["x"]) for r in out[2]] == [(DIM, 1.0)]
    assert [(r["feat"], r["x"]) for r in out[3]] == [(DIM, 1.0)]


def test_feature_ids_match_duckdb_twin(spark, duck):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = sorted(
        (r["doc_id"], r["feat"])
        for r in docs.select(
            "doc_id", F.explode(feature_ids("text", DIM, (1, 2))).alias("feat")
        ).collect()
    )
    want = sorted(
        (int(a), int(b))
        for a, b in duck.sql(
            sql_feature_ids("documents", DIM, (1, 2))
        ).fetchall()
    )
    assert got == want and len(got) > 1000


def test_classifier_separates_and_loss_decreases(spark):
    df = _labeled_corpus(spark)
    model = train_quality_classifier(
        df, "label", dim=DIM, n_iter=30, lr=2.0
    )
    assert model.losses[0] > model.losses[-1]
    assert model.losses[-1] < 0.3
    scored = score_quality(df, model).join(df.select("doc_id", "label"), "doc_id")
    wrong = scored.where(
        (F.col("prob") > 0.5) != (F.col("label") == 1)
    ).count()
    assert wrong == 0


def test_classifier_deterministic(spark):
    df = _labeled_corpus(spark, n_per_class=15)
    m1 = train_quality_classifier(df, "label", dim=DIM, n_iter=8, lr=1.0)
    m2 = train_quality_classifier(df, "label", dim=DIM, n_iter=8, lr=1.0)
    assert np.array_equal(m1.weights, m2.weights)
    assert m1.losses == m2.losses


def test_classifier_matches_numpy_reference(spark):
    """One exact-recipe reference: same features, same fixed-point
    margin/gradient, same updates — weights must agree to float
    tolerance (exp() may differ in the last ulp across runtimes)."""
    rows = [(0, "good clean text", 1), (1, "spam spam junk", 0),
            (2, "good text here", 1), (3, "junk spam now", 0)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    n_iter, lr = 5, 1.0
    model = train_quality_classifier(df, "label", dim=DIM, n_iter=n_iter, lr=lr)

    def half_up(v):
        return math.copysign(math.floor(abs(v) + 0.5), v)

    feats = []
    for _, text, y in rows:
        toks = text.lower().split()
        ids = [_py_feat(t) for t in toks]
        fx = {f: ids.count(f) / len(ids) for f in set(ids)}
        fx[DIM] = 1.0
        feats.append((fx, float(y)))
    w = np.zeros(DIM + 1)
    for _ in range(n_iter):
        grad_fix = np.zeros(DIM + 1, dtype=np.int64)
        for fx, y in feats:
            m = sum(half_up(w[f] * x * LM_SCALE) for f, x in fx.items()) / LM_SCALE
            p = 1.0 / (1.0 + math.exp(-m))
            for f, x in fx.items():
                grad_fix[f] += int(half_up((p - y) * x * LM_SCALE))
        w = w - lr * (grad_fix / LM_SCALE / len(feats))
    assert np.allclose(model.weights, w, atol=1e-9)


def test_score_paths_bit_equal(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    df = _labeled_corpus(spark, n_per_class=10)
    model = train_quality_classifier(df, "label", dim=DIM, n_iter=5, lr=1.0)
    a = sorted(
        (r["doc_id"], r["margin"], r["prob"])
        for r in score_quality(docs, model).collect()
    )
    b = sorted(
        (r["doc_id"], r["margin"], r["prob"])
        for r in score_quality_pandas(docs, model).collect()
    )
    assert a == b  # identical fixed-point margins -> identical doubles
    assert len(a) == 120


def test_importance_upweights_target_like_docs(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    target = docs.where(F.col("lang") == "en")
    model = importance_log_ratios(
        hashed_ngram_profile(target, dim=DIM, ns=(1, 2)),
        hashed_ngram_profile(docs, dim=DIM, ns=(1, 2)),
        dim=DIM,
        ns=(1, 2),
    )
    scored = (
        score_importance(docs, model)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg(F.col("logw") / F.col("n_feats")).alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in scored}
    assert means[True] > means[False]


def test_importance_logw_matches_duckdb_twin(spark, duck):
    docs = load_table(spark, SF_SMOKE, "documents")
    target = docs.where(F.col("lang") == "fr")
    model = importance_log_ratios(
        hashed_ngram_profile(target, dim=DIM, ns=(1,)),
        hashed_ngram_profile(docs, dim=DIM, ns=(1,)),
        dim=DIM,
        ns=(1,),
        alpha=0.5,
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in score_importance(docs, model).collect()
    }
    duck.sql("CREATE OR REPLACE VIEW __target AS SELECT * FROM documents WHERE lang = 'fr'")
    want = {
        int(i): (int(n), float(w))
        for i, n, w in duck.sql(
            sql_importance_logw(
                "documents", "__target", "documents", DIM, (1,), 0.5
            )
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], k
        # ln() differs in the last ulp across engines; each of n_feats
        # fixed-point roundings can move by 1e-9.
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-9 * max(got[k][0], 1))


def test_importance_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], "doc_id long, text string"
    )
    model = importance_log_ratios(
        hashed_ngram_profile(docs, dim=DIM),
        hashed_ngram_profile(docs, dim=DIM),
        dim=DIM,
    )
    out = {r["doc_id"]: (r["n_feats"], r["logw"]) for r in score_importance(docs, model).collect()}
    assert out[2] == (0, 0.0) and out[3] == (0, 0.0)
    assert out[1][0] > 0 and out[1][1] == pytest.approx(0.0)  # self-ratio ~ 0


def test_resample_deterministic_temperature_and_salt(spark):
    scored = spark.createDataFrame(
        [(i, float(-i)) for i in range(50)], "doc_id long, logw double"
    )
    a = [r["doc_id"] for r in importance_resample(scored, 10, salt=1).collect()]
    b = [r["doc_id"] for r in importance_resample(scored, 10, salt=1).collect()]
    assert a == b and len(a) == 10
    # temperature -> 0: pure exploitation = top-k by logw (ids 0..9)
    cold = {
        r["doc_id"]
        for r in importance_resample(scored, 10, temperature=1e-9).collect()
    }
    assert cold == set(range(10))
    # hot + different salts: selection driven by hash noise, not weight
    hot1 = {r["doc_id"] for r in importance_resample(scored, 10, temperature=1e9, salt=1).collect()}
    hot2 = {r["doc_id"] for r in importance_resample(scored, 10, temperature=1e9, salt=2).collect()}
    assert hot1 != hot2
    # k >= n keeps everything
    assert importance_resample(scored, 100).count() == 50


def test_resample_string_ids_get_real_gumbel_noise(spark):
    """String doc ids must hash through xxhash64, not degenerate: with a
    numeric-only pmod the key is NULL for every row and hot-temperature
    resampling silently turns into ordering by id (driver ADVICE r7)."""
    scored = spark.createDataFrame(
        [(f"doc-{i:03d}", float(-i)) for i in range(50)],
        "doc_id string, logw double",
    )
    a = [r["doc_id"] for r in importance_resample(scored, 10, salt=1).collect()]
    b = [r["doc_id"] for r in importance_resample(scored, 10, salt=1).collect()]
    assert a == b and len(a) == 10
    # cold: pure top-k by weight regardless of id type
    cold = {
        r["doc_id"]
        for r in importance_resample(scored, 10, temperature=1e-9).collect()
    }
    assert cold == {f"doc-{i:03d}" for i in range(10)}
    # hot: the selection must be noise-driven — different salts pick
    # different sets, and NOT the first-10-by-id degenerate ordering
    hot1 = {
        r["doc_id"]
        for r in importance_resample(
            scored, 10, temperature=1e9, salt=1
        ).collect()
    }
    hot2 = {
        r["doc_id"]
        for r in importance_resample(
            scored, 10, temperature=1e9, salt=2
        ).collect()
    }
    assert hot1 != hot2
    assert hot1 != {f"doc-{i:03d}" for i in range(10)}
    # per-stratum variant shares the same generic-id path
    strat = scored.withColumn("src", F.expr("length(doc_id) % 2"))
    by1 = importance_resample_by(
        strat, "src", 5, temperature=1e9, salt=1
    ).count()
    assert by1 == 5  # one stratum here; k rows from it


def test_classify_guards(spark):
    scored = spark.createDataFrame([(1, 0.0)], "doc_id long, logw double")
    with pytest.raises(ValueError):
        importance_resample(scored, -1)
    with pytest.raises(ValueError):
        importance_resample(scored, 1, temperature=0.0)
    with pytest.raises(ValueError):
        importance_resample(scored, 1, salt=2**31)
    with pytest.raises(ValueError):
        importance_log_ratios(
            hashed_ngram_profile(scored.selectExpr("doc_id", "'x' AS text")),
            hashed_ngram_profile(scored.selectExpr("doc_id", "'x' AS text")),
            alpha=0.0,
        )
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty training set"):
        train_quality_classifier(empty, "label", n_iter=1)
    from parquet_to_postgres_spark.llm.classify import train_lang_id

    empty_l = spark.createDataFrame([], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="empty training set"):
        train_lang_id(empty_l)


def test_classifier_scoring_is_stream_batch_unified(spark):
    """score_quality_pandas is stateless and scan-level, so the SAME
    code scores an unbounded stream in append mode unchanged — the
    stream/batch unification the zero-shuffle Arrow path buys.  An
    availableNow pass over the documents fixture must equal the batch
    run row-for-row (same fixed-point margins, same probs)."""
    from parquet_to_postgres_spark.llm.classify import LinearModel

    dim = 1 << 10
    model = LinearModel((np.arange(dim + 1) % 17 - 8) / 10.0, dim, (1,))
    schema = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
        .select("doc_id", "text")
    )
    q = (
        score_quality_pandas(stream, model)
        .writeStream.format("memory")
        .queryName("clf_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM clf_stream").collect()
    )
    batch = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    want = sorted(
        tuple(r) for r in score_quality_pandas(batch, model).collect()
    )
    assert got == want and len(got) == 500


def _lang_corpus(spark, n_per_lang=30):
    """Three synthetic 'languages' with disjoint character inventories."""
    inv = {"aa": "abcd", "xx": "wxyz", "mm": "mnop"}
    rows = []
    i = 0
    for lang, chars in inv.items():
        for k in range(n_per_lang):
            words = [
                "".join(chars[(k + j + w) % 4] for j in range(4))
                for w in range(8)
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_id_naive_bayes_separates(spark):
    from parquet_to_postgres_spark.llm.classify import (
        predict_lang,
        train_lang_id,
    )

    docs = _lang_corpus(spark)
    train = docs.where("doc_id % 2 = 0")
    test = docs.where("doc_id % 2 = 1")
    model = train_lang_id(train)
    pred = predict_lang(test, model).join(
        test.select("doc_id", "lang"), "doc_id"
    )
    n = pred.count()
    ok = pred.where(F.col("pred_lang") == F.col("lang")).count()
    assert n == 45 and ok == n  # disjoint charsets -> perfect separation
    # short/NULL docs surface with NULL prediction, not dropped
    edge = spark.createDataFrame(
        [(100, "ab"), (101, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["pred_lang"] for r in predict_lang(edge, model).collect()}
    assert out == {100: None, 101: None}


def test_lang_id_deterministic(spark):
    from parquet_to_postgres_spark.llm.classify import (
        predict_lang,
        train_lang_id,
    )

    docs = _lang_corpus(spark, n_per_lang=10)
    m1, m2 = train_lang_id(docs), train_lang_id(docs)
    assert m1.totals == m2.totals and m1.vocab_size == m2.vocab_size
    a = sorted(tuple(r) for r in predict_lang(docs, m1).collect())
    b = sorted(tuple(r) for r in predict_lang(docs, m2).collect())
    assert a == b


def test_importance_resample_by_strata(spark):
    from parquet_to_postgres_spark.llm.classify import importance_resample_by

    rows = [(i, "s" + str(i % 3), float(-i)) for i in range(60)]
    scored = spark.createDataFrame(rows, "doc_id long, src string, logw double")
    out = importance_resample_by(scored, "src", 5, weight_col="logw")
    per = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # deterministic
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in importance_resample_by(scored, "src", 5).collect()
    )
    assert a == b
    # cold temperature: exact per-stratum top-k by weight (lowest ids)
    cold = importance_resample_by(scored, "src", 5, temperature=1e-9)
    assert sorted(r["doc_id"] for r in cold.collect()) == sorted(
        range(15)
    )


def test_normalize_unicode_nfkc(spark):
    from parquet_to_postgres_spark.llm.text import normalize_unicode

    rows = [
        (1, "caf\u00e9"),             # composed e-acute
        (2, "cafe\u0301"),            # decomposed e + combining acute
        (3, "\uff28\uff45\uff4c"),  # full-width Hel
        (4, "\ufb01le"),              # fi ligature
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", normalize_unicode("text").alias("t")
        ).collect()
    }
    assert out[1] == out[2] == "caf\u00e9"
    assert out[3] == "Hel"
    assert out[4] == "file"
    assert out[5] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown normalization form"):
        normalize_unicode("text", form="NFX")


def test_lang_id_ignores_null_labels(spark):
    """A NULL lang row must not poison training (review finding: it
    survived into totals and predict_lang's sorted() threw TypeError)."""
    from parquet_to_postgres_spark.llm.classify import (
        predict_lang,
        train_lang_id,
    )

    docs = _lang_corpus(spark, n_per_lang=5).unionByName(
        spark.createDataFrame(
            [(999, "unlabeled text row", None)],
            "doc_id long, text string, lang string",
        )
    )
    model = train_lang_id(docs)
    assert None not in model.totals
    out = predict_lang(docs, model)
    assert out.count() == 16  # all docs scored, incl. the unlabeled one
