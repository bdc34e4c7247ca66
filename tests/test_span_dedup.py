"""Exact-substring (repeated-span) dedup — word-granular ExactSubstr."""

from __future__ import annotations

import pytest

from parquet_to_postgres_spark.llm.dedup import (
    dedup_repeated_spans,
    sql_dedup_repeated_spans,
)
from parquet_to_postgres_spark.tables import load_table

from .conftest import SF_SMOKE


def _texts(df, id_col="doc_id", text_col="text"):
    return {r[id_col]: r[text_col] for r in df.collect()}


def test_cross_doc_span_removed_keep_first(spark):
    df = spark.createDataFrame(
        [
            (1, "intro words common span here tail one"),
            (2, "other lead common span here tail two"),
            (3, "nothing shared at all in this doc"),
        ],
        "doc_id long, text string",
    )
    # "common span here tail" is a repeated 4-gram (positions 2 and 2)
    out = _texts(dedup_repeated_spans(df, n=4))
    assert out[1] == "intro words common span here tail one"  # canonical kept
    assert out[2] == "other lead two"  # the 4 covered tokens removed
    assert out[3] == "nothing shared at all in this doc"


def test_within_doc_repeat_and_keep_first_false(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y x y")], "doc_id long, text string"
    )
    # 2-gram "x y" repeats at starts 0,2,4,6 (also "y x" at 1,3,5);
    # canonical "x y"@0 protects pos 0-1 and canonical "y x"@1 protects
    # pos 1-2 — every duplicated span keeps its first occurrence verbatim
    out = _texts(dedup_repeated_spans(df, n=2))
    assert out[1] == "x y x"
    none = _texts(dedup_repeated_spans(df, n=2, keep_first=False))
    assert none[1] == ""  # every occurrence removed, doc -> empty string


def test_self_overlapping_canonical_survives_verbatim(spark):
    """Review finding: with repeat period < n ("a a a ... a", n=8) the
    removed neighboring occurrences used to cover 7 of the canonical
    span's 8 tokens.  The canonical occurrence must survive verbatim."""
    df = spark.createDataFrame(
        [(1, " ".join(["a"] * 10)), (2, " ".join(["a"] * 10))],
        "doc_id long, text string",
    )
    out = _texts(dedup_repeated_spans(df, n=8))
    assert out[1] == " ".join(["a"] * 8)  # the full canonical 8-gram
    assert out[2] == ""  # the copy doc holds no canonical spans


def test_clean_corpus_passes_through_byte_identical(spark):
    rows = [
        (1, "a  double  spaced doc unique one"),  # empty tokens preserved
        (2, ""),
        (3, None),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _texts(dedup_repeated_spans(df, n=3))
    assert out == dict(rows)


def test_min_count_threshold(spark):
    df = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r t")], "doc_id long, text string"
    )
    # "p q r" occurs twice: removed at min_count=2, kept at min_count=3
    out2 = _texts(dedup_repeated_spans(df, n=3, min_count=2))
    assert out2 == {1: "p q r s", 2: "t"}
    out3 = _texts(dedup_repeated_spans(df, n=3, min_count=3))
    assert out3 == {1: "p q r s", 2: "p q r t"}


def test_matches_duckdb_twin_on_documents(spark, duck):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # a lowered n makes natural repeats likely; also union a shifted copy
    # of 30 docs so cross-doc duplicated spans certainly exist
    copies = docs.where("doc_id < 60").selectExpr(
        "doc_id + 1000000 AS doc_id", "text"
    )
    corpus = docs.unionAll(copies)
    duck.sql(
        "CREATE OR REPLACE VIEW span_corpus AS "
        "SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
        "WHERE doc_id < 60"
    )
    got = _texts(
        dedup_repeated_spans(corpus, n=5, id_col="doc_id", text_col="text")
    )
    want = {
        int(i): t
        for i, t in duck.sql(
            sql_dedup_repeated_spans("span_corpus", n=5)
        ).fetchall()
    }
    assert len(got) == len(want) > 300
    assert got == want
    # and the copies really did trigger removals
    assert any(got[k] != want_orig for k, want_orig in _texts(corpus).items())


def test_span_dedup_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup_repeated_spans(df, n=1)
    with pytest.raises(ValueError):
        dedup_repeated_spans(df, min_count=1)


def test_span_dedup_max_doc_tokens_guard(spark):
    """The rebuild holds each doc's tokens in one executor's memory;
    max_doc_tokens turns a would-be mid-job OOM into an up-front
    ValueError naming the worst offender (VERDICT r7 item 7)."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, " ".join(f"t{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    # bound below the worst doc: refused, offender named
    with pytest.raises(ValueError, match=r"document 2 has 50 tokens"):
        dedup_repeated_spans(df, n=3, max_doc_tokens=20)
    # bound at/above the worst doc: identical to the unguarded run
    guarded = {
        r["doc_id"]: r["text"]
        for r in dedup_repeated_spans(df, n=3, max_doc_tokens=50).collect()
    }
    plain = {
        r["doc_id"]: r["text"]
        for r in dedup_repeated_spans(df, n=3).collect()
    }
    assert guarded == plain
    # nonsense bound rejected
    with pytest.raises(ValueError, match="max_doc_tokens must be >= n"):
        dedup_repeated_spans(df, n=3, max_doc_tokens=2)
