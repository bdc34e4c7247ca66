"""Unigram-LM tokenizer (the SentencePiece "unigram" recipe): seed a
substring vocabulary, EM-fit piece probabilities, prune to the target
size, segment by Viterbi.

Split of labor mirrors ``bpe.py`` — the tokenizer family's contract:

- **The word-frequency table is the sufficient statistic.**
  :func:`bpe.bpe_word_counts` (reused) produces it with one map-side-
  combinable shuffle; everything after consumes ``word -> count``.
- **The E-step is distributed.**  Each EM iteration broadcasts the
  current piece log-probs and computes per-word EXPECTED piece counts
  (scaled forward-backward over all segmentations) in a vectorized
  pandas UDF over the word table, then reduces them with a
  piece-keyed, map-side-combinable aggregate whose reduce side is
  bounded by the VOCAB, not the corpus.  Expected counts are rounded to
  int64 fixed-point before the sum, so the fit is bit-deterministic
  under any partitioning.
- **The M-step and pruning are driver-side and vocab-bounded** (one
  ≤ |vocab|-row collect per iteration — the same bounded-model pattern
  as BPE merge learning, k-means, and the classifier gradient).
  Pruning drops the lowest-probability pieces (ties broken on the piece
  string), never single characters — segmentation coverage is total by
  construction.
- **Application is embarrassingly parallel.**  :func:`unigram_tokenize`
  ships the vocab in the UDF closure and Viterbi-segments each word
  with per-batch memoization; no shuffle.  Characters never seen in
  training segment as single-char pieces at a floor log-prob, so
  round-trip holds on any input.

Word boundaries use the SentencePiece convention: each word is
prefixed with "▁" (U+2581) before segmentation; detokenization
concatenates pieces and turns "▁" back into a space.

Reference scope note: the reference ETL (main.rs) has no tokenizer;
like bpe.py this implements the training-data-pipeline surface the
north star mandates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_MARK = "▁"
UNK_LOGP = -100.0
# Fixed-point scale for expected-count sums.  int64 bound: a single
# word's contribution is <= len(word) * count(word) * _EC_SCALE, so the
# scale must satisfy len * count < 2^63 / _EC_SCALE (~9.2e9 here) per
# distinct word — comfortable until a single word approaches a billion
# occurrences; drop the scale a decade per decade of corpus beyond that.
_EC_SCALE = 1_000_000_000


@dataclass(frozen=True)
class UnigramModel:
    """Piece -> log-probability.  ``pieces`` is sorted by piece string
    (presentation); probabilities sum to 1 over the vocab."""

    logp: dict[str, float]

    @property
    def pieces(self) -> list[str]:
        return sorted(self.logp)


def _seed_vocab(
    rows: list, max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Seed piece weights: weighted substring counts of the marked words,
    truncated to the ``seed_size`` heaviest (ties on the piece string);
    single characters are always included."""
    counts: dict[str, float] = {}
    chars: set[str] = set()
    for word, c in rows:
        marked = WORD_MARK + word
        n = len(marked)
        for ch in marked:
            chars.add(ch)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                piece = marked[i:j]
                counts[piece] = counts.get(piece, 0.0) + c
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(seed_size - len(chars), 0)]
    # sorted: dict order (and thus later float-sum order) must not
    # depend on set iteration order, which varies across processes
    return {p: counts[p] for p in [*sorted(chars), *multi]}


def _forward_backward(
    word: str, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Expected piece counts over ALL segmentations of one marked word
    under the current unigram LM — scaled forward-backward so long
    words cannot underflow.  Unknown single chars participate at the
    UNK floor (they must, or a word containing one has zero mass)."""
    n = len(word)

    def plog(piece: str) -> float | None:
        got = logp.get(piece)
        if got is None and len(piece) == 1:
            return UNK_LOGP
        return got

    # alpha[i]: scaled mass of prefixes ending at i; scale[i] its log
    alpha = [0.0] * (n + 1)
    ascale = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        tot, mx = 0.0, None
        terms = []
        for i in range(max(0, j - max_piece_len), j):
            lp = plog(word[i:j])
            if lp is None or alpha[i] == 0.0:
                continue
            t = math.log(alpha[i]) + ascale[i] + lp
            terms.append((i, t))
            mx = t if mx is None else max(mx, t)
        if mx is None:
            continue
        for _, t in terms:
            tot += math.exp(t - mx)
        alpha[j] = tot
        ascale[j] = mx
    if alpha[n] == 0.0:
        return {}
    # beta[i]: scaled mass of suffixes starting at i
    beta = [0.0] * (n + 1)
    bscale = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        terms = []
        mx = None
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            lp = plog(word[i:j])
            if lp is None or beta[j] == 0.0:
                continue
            t = math.log(beta[j]) + bscale[j] + lp
            terms.append((j, t))
            mx = t if mx is None else max(mx, t)
        if mx is None:
            continue
        beta[i] = sum(math.exp(t - mx) for _, t in terms)
        bscale[i] = mx
    logz = math.log(alpha[n]) + ascale[n]
    out: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == 0.0:
            continue
        la = math.log(alpha[i]) + ascale[i]
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            lp = plog(word[i:j])
            if lp is None or beta[j] == 0.0:
                continue
            lb = math.log(beta[j]) + bscale[j]
            e = math.exp(la + lp + lb - logz)
            if e > 0.0:
                piece = word[i:j]
                out[piece] = out.get(piece, 0.0) + e
    return out


def _expected_counts(
    word_counts: DataFrame, logp: dict[str, float], max_piece_len: int
) -> list:
    """ONE distributed E-step: per-word forward-backward in a pandas
    UDF, int64 fixed-point contributions, piece-keyed map-side-combined
    sum, vocab-bounded collect."""

    @F.pandas_udf("map<string,bigint>")
    def _estep(words: pd.Series, counts: pd.Series) -> pd.Series:
        cache: dict[str, dict[str, float]] = {}
        out = []
        for w, c in zip(words, counts):
            marked = WORD_MARK + w
            ec = cache.get(marked)
            if ec is None:
                ec = _forward_backward(marked, logp, max_piece_len)
                cache[marked] = ec
            out.append(
                {p: int(round(e * c * _EC_SCALE)) for p, e in ec.items()}
            )
        return pd.Series(out)

    return (
        word_counts.select(
            F.explode(_estep(F.col("word"), F.col("c"))).alias(
                "piece", "ec"
            )
        )
        .groupBy("piece")
        .agg(F.sum("ec").alias("ec"))
        .collect()
    )


def train_unigram(
    word_counts: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 8,
    seed_size: int = 2000,
    em_iters: int = 2,
    prune_keep: float = 0.75,
    max_vocab_words: int = 50_000,
) -> UnigramModel:
    """Fit the unigram LM: seed → (EM × ``em_iters`` → prune to
    ``prune_keep`` of the multi-char pieces) until ``vocab_size`` →
    final EM pass.  Deterministic end to end: fixed-point E-step sums,
    ties on the piece string everywhere.

    ``max_vocab_words`` bounds the driver's ONE corpus-derived collect
    (the word table, like train_bpe); every later collect is
    vocab-bounded."""
    rows = [
        (r["word"], int(r["c"]))
        for r in word_counts.orderBy(F.col("c").desc(), "word")
        .limit(max_vocab_words)
        .collect()
    ]
    if not rows:
        raise ValueError("empty word-count table")
    weights = _seed_vocab(rows, max_piece_len, seed_size)
    total = sum(w for _, w in sorted(weights.items()))
    logp = {p: math.log(w / total) for p, w in weights.items()}
    wc = word_counts.sparkSession.createDataFrame(
        rows, "word string, c long"
    ).cache()
    try:
        while True:
            for _ in range(em_iters):
                got = _expected_counts(wc, logp, max_piece_len)
                ec = {r["piece"]: r["ec"] / _EC_SCALE for r in got}
                # sorted: collect order is partition order, not stable
                tot = sum(v for _, v in sorted(ec.items()))
                # pieces with zero expected count fall out of the vocab
                # unless single-char (coverage)
                logp = {
                    p: math.log(e / tot)
                    for p, e in ec.items()
                    if e > 0.0
                }
                for p in [q for q in weights if len(q) == 1]:
                    logp.setdefault(p, UNK_LOGP)
            multi = sorted(
                (p for p in logp if len(p) > 1),
                key=lambda p: (logp[p], p),
            )
            n_chars = sum(1 for p in logp if len(p) == 1)
            target_multi = max(vocab_size - n_chars, 0)
            if len(multi) <= target_multi:
                break
            keep = max(int(len(multi) * prune_keep), target_multi)
            if keep >= len(multi):
                keep = target_multi
            drop = set(multi[: len(multi) - keep])
            logp = {p: lp for p, lp in logp.items() if p not in drop}
        # renormalize after the last prune (sorted: see above)
        z = math.log(sum(math.exp(lp) for _, lp in sorted(logp.items())))
        return UnigramModel({p: lp - z for p, lp in logp.items()})
    finally:
        wc.unpersist()


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Max-probability segmentation of one marked word; deterministic
    tie-break prefers the longer final piece (smaller split point)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None and len(piece) == 1:
                lp = UNK_LOGP
            if lp is None or best[i] == -math.inf:
                continue
            s = best[i] + lp
            if s > best[j] or (s == best[j] and i < back[j]):
                best[j] = s
                back[j] = i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_tokenize(
    docs: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    max_piece_len: int = 8,
) -> DataFrame:
    """``(id, tokens array<string>, n_tokens)`` — vocab rides the UDF
    closure, Viterbi per word with per-batch memoization, no shuffle
    (same contract as bpe_tokenize; plan-pinned)."""
    logp = dict(model.logp)

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
                marked = WORD_MARK + w
                got = cache.get(marked)
                if got is None:
                    got = viterbi_segment(marked, logp, max_piece_len)
                    cache[marked] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.select(
        F.col(id_col), _tok(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))


def detokenize(tokens_col: str = "tokens") -> Column:
    """Reconstruct the (lowercased, whitespace-normalized) text: concat
    pieces, word marks back to spaces — round-trip pinned in tests."""
    return F.trim(
        F.replace(
            F.concat_ws("", F.col(tokens_col)),
            F.lit(WORD_MARK),
            F.lit(" "),
        )
    )
