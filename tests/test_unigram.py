"""Unigram-LM (SentencePiece-style) tokenizer."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parquet_to_postgres_spark.llm.bpe import bpe_word_counts
from parquet_to_postgres_spark.llm.unigram import (
    WORD_MARK,
    UnigramModel,
    _forward_backward,
    detokenize,
    train_unigram,
    unigram_tokenize,
    viterbi_segment,
)
from parquet_to_postgres_spark.tables import load_table

from .conftest import SF_SMOKE


def test_forward_backward_hand_computed():
    """Two segmentations of 'ab': [ab] and [a][b].  With p(ab)=1/2,
    p(a)=p(b)=1/4: P([ab])=1/2, P([a][b])=1/16, Z=9/16.  Expected
    counts: ab -> 8/9, a and b -> 1/9 each."""
    logp = {
        "ab": math.log(0.5),
        "a": math.log(0.25),
        "b": math.log(0.25),
    }
    ec = _forward_backward("ab", logp, max_piece_len=2)
    assert ec["ab"] == pytest.approx(8 / 9)
    assert ec["a"] == pytest.approx(1 / 9)
    assert ec["b"] == pytest.approx(1 / 9)


def test_forward_backward_long_word_no_underflow():
    """400 chars at p=1e-6 each would underflow an unscaled forward pass
    (1e-2400); scaling must keep the counts finite and exact: a single
    segmentation -> every char has expected count == its multiplicity."""
    logp = {"a": math.log(1e-6)}
    ec = _forward_backward("a" * 400, logp, max_piece_len=1)
    assert ec["a"] == pytest.approx(400.0)


def test_viterbi_prefers_learned_pieces():
    logp = {"▁ab": math.log(0.5), "▁": math.log(0.1),
            "a": math.log(0.2), "b": math.log(0.2)}
    assert viterbi_segment("▁ab", logp) == ["▁ab"]
    # unknown char falls back to a single-char UNK piece
    assert viterbi_segment("▁azb", logp) == ["▁", "a", "z", "b"]


def test_train_learns_frequent_word_as_piece(spark):
    rows = [(i, "spark " * 5 + "sql") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_unigram(
        bpe_word_counts(docs), vocab_size=40, seed_size=300
    )
    # the dominant word must survive as one piece and win the Viterbi
    assert WORD_MARK + "spark" in model.logp
    toks = unigram_tokenize(docs, model)
    row = toks.where(F.col("doc_id") == 0).collect()[0]
    assert row["tokens"].count(WORD_MARK + "spark") == 5
    # probabilities normalized
    z = sum(math.exp(lp) for lp in model.logp.values())
    assert z == pytest.approx(1.0, abs=1e-9)


def test_roundtrip_on_documents(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).limit(120)
    model = train_unigram(
        bpe_word_counts(docs), vocab_size=120, seed_size=600
    )
    out = unigram_tokenize(docs, model).withColumn(
        "rt", detokenize("tokens")
    )
    orig = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("want"),
    )
    bad = (
        out.join(orig, "doc_id")
        .where(F.col("rt") != F.col("want"))
        .count()
    )
    assert bad == 0
    # compression: learned pieces beat pure chars
    stats = out.join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    ).agg(F.sum("n_tokens").alias("t"), F.sum("n_chars").alias("c")).collect()[0]
    assert stats["t"] < stats["c"]


def test_training_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).limit(60)
    m1 = train_unigram(bpe_word_counts(docs), vocab_size=80, seed_size=400)
    m2 = train_unigram(bpe_word_counts(docs), vocab_size=80, seed_size=400)
    assert m1.logp == m2.logp


def test_vocab_size_respected_and_chars_kept(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).limit(60)
    wc = bpe_word_counts(docs)
    n_chars = len(
        {ch for r in wc.collect() for ch in WORD_MARK + r["word"]}
    )
    model = train_unigram(wc, vocab_size=n_chars + 10, seed_size=400)
    multi = [p for p in model.logp if len(p) > 1]
    singles = [p for p in model.logp if len(p) == 1]
    assert len(singles) == n_chars  # coverage never pruned
    assert len(multi) <= 10


def test_unknown_chars_roundtrip(spark):
    train = spark.createDataFrame(
        [(1, "plain words only")], "doc_id long, text string"
    )
    model = train_unigram(bpe_word_counts(train), vocab_size=40, seed_size=200)
    novel = spark.createDataFrame(
        [(1, "plain w0rds@zürich")], "doc_id long, text string"
    )
    out = unigram_tokenize(novel, model).withColumn("rt", detokenize("tokens"))
    assert out.collect()[0]["rt"] == "plain w0rds@zürich"


def test_empty_word_table_rejected(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty word-count table"):
        train_unigram(bpe_word_counts(docs))
