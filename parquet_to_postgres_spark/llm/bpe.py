"""Byte-pair-encoding tokenizer: distributed statistics, driver-side
merge learning, distributed application.

The 100 TB split of labor is the whole design:

- **Training needs only the word-frequency table.**  BPE's merge loop
  consumes nothing but ``word → count`` — that table is the sufficient
  statistic.  :func:`bpe_word_counts` computes it with ONE
  map-side-combinable shuffle over the corpus; :func:`train_bpe` then
  collects the top ``max_vocab_words`` rows (a bounded driver
  materialization that covers effectively all token mass under a
  Zipfian word distribution — the truncation knob is explicit) and runs
  the classic merge loop driver-side, where it is O(vocab) work, not
  O(corpus).
- **Application is embarrassingly parallel.**  :func:`bpe_tokenize`
  broadcasts the learned merge ranks and segments every document in a
  vectorized pandas UDF with per-batch word memoization (real corpora
  repeat words constantly; each distinct word is segmented once per
  batch).  No shuffle is introduced.

Everything is deterministic: merge selection breaks count ties on the
lexicographically smallest pair, so two training runs over the same
counts produce the identical merge list, and tokenization is a pure
function of (text, merges).

Reference scope note: the reference ETL (main.rs) has no tokenizer;
this implements the training-data-pipeline surface (SURVEY §2B L5/L8
adjacent) that a corpus engine needs for token accounting and packing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(word, c)`` over whitespace-split words — one corpus scan, one
    map-side-combinable aggregate; the reduce side is vocabulary-sized."""
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    out = docs.select(w).where(F.col("word") != "")
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return out.groupBy("word").agg(F.count(F.lit(1)).alias("c"))


def train_bpe(
    word_counts: DataFrame,
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Collects the ``max_vocab_words`` most frequent words (ties broken
    on the word for determinism) and runs the standard greedy loop:
    count weighted adjacent symbol pairs, merge the most frequent pair
    (ties: lexicographically smallest), repeat.  Words end with the
    ``</w>`` marker so merges can capture word-final units.

    Returns the ordered merge list — order IS the tokenizer (rank =
    merge priority in :func:`bpe_tokenize`)."""
    rows = (
        word_counts.orderBy(F.col("c").desc(), "word")
        .limit(max_vocab_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment ONE word with learned merge ranks: repeatedly apply the
    lowest-ranked adjacent pair present — the exact inverse of the
    training loop's greedy order, so a word seen in training segments
    into its training-time symbols."""
    sym = list(word) + [END]
    while len(sym) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """``(id, tokens array<string>, n_tokens)`` — the merge ranks ride
    the UDF closure (broadcast with the task), each Arrow batch
    memoizes per distinct word, no shuffle is introduced."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t: str | None) -> list[str] | None:
            if t is None:
                return None
            if lowercase:
                t = t.lower()
            out: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = segment_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.select(
        F.col(id_col), _tok(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))


def detokenize(tokens_col: str = "tokens") -> Column:
    """Reconstruct the (lowercased, whitespace-normalized) text:
    concatenate and turn each ``</w>`` back into a space — the exact
    round-trip property pinned in tests."""
    return F.trim(
        F.replace(
            F.concat_ws("", F.col(tokens_col)), F.lit(END), F.lit(" ")
        )
    )
