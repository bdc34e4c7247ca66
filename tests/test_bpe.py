"""BPE tokenizer: deterministic training, exact segmentation, round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_postgres_spark.llm import bpe

from .conftest import SF_SMOKE


def test_bpe_classic_micro_example(spark):
    """The textbook low/lower/lowest corpus: merge order is fully
    determined by (count desc, pair lexicographic) — hand-verifiable."""
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    wc = bpe.bpe_word_counts(docs)
    assert {(r["word"], r["c"]) for r in wc.collect()} == {
        ("low", 3), ("lower", 1), ("lowest", 1)
    }
    merges = bpe.train_bpe(wc, n_merges=5)
    assert merges == [
        ("l", "o"),       # (l,o) and (o,w) tie at 5 → lexicographic
        ("lo", "w"),      # 5
        ("low", "</w>"),  # 3
        ("low", "e"),     # 2
        ("lowe", "r"),    # five pairs tie at 1 → lexicographic
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.segment_word("low", ranks) == ["low</w>"]
    assert bpe.segment_word("lower", ranks) == ["lower", "</w>"]
    assert bpe.segment_word("lowest", ranks) == ["lowe", "s", "t", "</w>"]
    assert bpe.segment_word("slow", ranks) == ["s", "low</w>"]


def test_bpe_tokenize_roundtrip_and_determinism(spark):
    """Corpus-scale properties on the real documents table: detokenize
    reconstructs the lowercased whitespace-normalized text for EVERY
    doc; two independent train+tokenize runs agree exactly; n_tokens
    is positive and ≤ chars+words."""
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents.select("doc_id", "text")

    def run():
        merges = bpe.train_bpe(bpe.bpe_word_counts(docs), n_merges=60)
        return merges, bpe.bpe_tokenize(docs, merges)

    merges1, toks1 = run()
    merges2, toks2 = run()
    assert merges1 == merges2

    joined = toks1.join(docs, "doc_id").select(
        "doc_id",
        "n_tokens",
        bpe.detokenize().alias("rebuilt"),
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("norm"),
    )
    assert joined.where(F.col("rebuilt") != F.col("norm")).count() == 0
    bad = toks1.join(docs, "doc_id").where(
        (F.col("n_tokens") <= 0)
        | (
            F.col("n_tokens")
            > F.length("text") + F.size(F.split("text", r"\s+")) + 1
        )
    )
    assert bad.count() == 0

    t1 = sorted((r["doc_id"], tuple(r["tokens"])) for r in toks1.collect())
    t2 = sorted((r["doc_id"], tuple(r["tokens"])) for r in toks2.collect())
    assert t1 == t2


def test_bpe_compression_improves_with_merges(spark):
    """More merges → fewer tokens (monotone on this corpus), and with
    enough merges the frequent corpus words become single tokens."""
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents.select("doc_id", "text")
    wc = bpe.bpe_word_counts(docs)
    totals = {}
    for n in (0, 30, 120):
        merges = bpe.train_bpe(wc, n_merges=n)
        totals[n] = (
            bpe.bpe_tokenize(docs, merges)
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )
    assert totals[120] < totals[30] < totals[0]
    ranks = {p: i for i, p in enumerate(bpe.train_bpe(wc, n_merges=120))}
    top_word = wc.orderBy(F.col("c").desc(), "word").first()["word"]
    assert bpe.segment_word(top_word, ranks) == [top_word + bpe.END]
