"""Text analysis operators: token counting, quality scoring, language-ID,
document fingerprinting.

Everything stays JVM-side (built-in + higher-order functions) — no Python
in the hot path.  Formulas are chosen to be replicable in DuckDB SQL with
identical integer/double arithmetic, so every operator is hash-matchable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_MUL = 31
FINGERPRINT_PREFIX = 64

# Deterministic per-language marker words (drawn from the corpus
# vocabulary); language-ID scores a doc by marker hits per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("scan", "index", "query"),
    "de": ("join", "merge", "sort"),
    "es": ("stream", "batch", "window"),
    "fr": ("hash", "key", "order"),
    "zh": ("spark", "table", "part"),
}

QUALITY_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "scan", "join", "order")


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, " "))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and residual symbols
    each count as one token (a cheap proxy for subword tokenizer load)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))


def quality_features(text_col: str = "text") -> list[Column]:
    """Quality-scoring feature columns: length, token stats, stopword and
    punctuation ratios, and a blended quality score in [0, ~1]."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = F.split(c, " ")
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS))
    )
    alpha_space = F.length(F.regexp_replace(c, "[^a-z ]", ""))
    mean_tok_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    stop_ratio = stop_hits.cast("double") / n_tokens
    punct_ratio = (n_chars - alpha_space).cast("double") / n_chars
    score = (
        F.least(n_tokens.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.3
    )
    return [
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    ]


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Marker-hit count per language over the doc's distinct tokens."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))

    def hit_counter(markers: tuple[str, ...]):
        # single-arg lambda: a 2-arg lambda would be read by Spark as
        # (element, index) and break
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    return {lang: hit_counter(markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text_col: str = "text") -> Column:
    """Argmax language by marker hits; ties resolve in LANG_MARKERS order
    (the same CASE chain the SQL twin uses)."""
    scores = lang_scores(text_col)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front: lang wins if its score is
    # >= every later lang's score (strictly > earlier ones lose ties).
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(langs)):
            c = scores[langs[i]] >= scores[langs[j]]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, langs[i]).otherwise(expr)
    return expr


def fingerprint(text_col: str = "text", prefix: int = FINGERPRINT_PREFIX) -> Column:
    """Polynomial rolling hash of the first ``prefix`` chars:
    h = fold(ascii(c_i), h·31 + c mod 1e9+7).  Pure integer arithmetic —
    identical in Spark and DuckDB (left fold; the 0 seed is a no-op
    because 0·31 + c₁ = c₁)."""
    return F.expr(
        f"aggregate(transform(sequence(1, least(length({text_col}), {prefix})), "
        f"i -> ascii(substring({text_col}, i, 1))), "
        f"CAST(0 AS BIGINT), "
        f"(acc, c) -> (acc * {FINGERPRINT_MUL} + c) % {FINGERPRINT_MOD})"
    )


def pack_by_budget(
    df,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
):
    """Assign documents to token-budget packs (the context-window packing
    shape of sequence-training pipelines): deterministic packing in
    ``order_col`` order via the token-stream offset.

    pack_id = floor((cumsum_inclusive − n_tokens) / budget) — a doc goes
    in the pack its STARTING offset falls in.  Invariant: a pack minus
    its LAST doc always fits the budget, i.e. packs overflow by less
    than one document (the downstream consumer truncates or spills that
    tail doc — the standard offset-packing contract).  What matters at
    scale is that the whole assignment is ONE
    :func:`~..operators.distributed_cumsum` (no single-partition window)
    plus a projection, and is bit-reproducible across cluster sizes."""
    from ..operators import distributed_cumsum

    with_csum = distributed_cumsum(
        df, [F.col(order_col)], token_col, out_col="__csum"
    )
    return with_csum.withColumn(
        "pack_id",
        F.floor((F.col("__csum") - F.col(token_col)) / F.lit(budget)).cast(
            "long"
        ),
    ).drop("__csum")


def tf_idf(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
):
    """Per-(doc, term) TF-IDF: ``tf·(ln((N+1)/(df+1)) + 1)`` (smoothed
    idf, sklearn-style), with tf = term count / doc length.

    Shuffle budget: one explode→(doc, term) aggregate; doc lengths via a
    window over the SAME key (no extra exchange); document frequency is
    an aggregate down to one row per TERM (vocabulary-sized — tiny
    relative to the corpus) joined back by term; the corpus doc count N
    is a broadcast one-row cross join, never a driver-side action in
    the plan.  With ``top_k``, keeps the k highest-scoring terms per doc
    (rank window reuses the doc partitioning)."""
    from pyspark.sql import Window

    toks = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
    term_counts = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("n_term")
    )
    doc_w = Window.partitionBy(id_col)
    with_tf = term_counts.withColumn(
        "tf", F.col("n_term") / F.sum("n_term").over(doc_w)
    )
    docfreq = term_counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        with_tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "n_term",
            "tf",
            "df",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(
            F.col("tfidf").desc(), F.col("term")
        )
        scored = (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= top_k)
            .drop("rnk")
        )
    return scored


DECONTAM_NGRAM_N = 13


def word_ngrams(text_col: Column | str, n: int) -> Column:
    """Array of space-joined word ``n``-grams; empty when the document
    has fewer than ``n`` whitespace tokens.  (The ``size >= n`` guard
    matters: ``sequence(1, 0)`` would COUNT DOWN and fabricate grams.)

    The token array is bound as a lambda VARIABLE (the one-element
    ``transform(array(toks), a -> ...)`` wrapper) before the per-position
    slice: higher-order functions are interpreted, with no common-
    subexpression elimination inside lambda bodies, so referencing the
    split expression directly from the slice lambda would re-tokenize
    the whole document once per gram position — O(len²) per doc, a
    measured 14x slowdown at sf0.1.  A bound variable is evaluated once
    and read O(1) per element."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")

    def build(a: Column) -> Column:
        return F.when(
            F.size(a) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(a) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(a, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), build), 1)


def _gram_id(gram: Column) -> Column:
    """60-bit md5-derived integer id of an n-gram (same construction as
    dedup.unit_id, so the DuckDB twin is UNIT_ID_SQL)."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def contaminated_ids(
    corpus,
    eval_df,
    n: int = DECONTAM_NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
):
    """ids of corpus documents sharing ANY word ``n``-gram with the eval
    set — the standard benchmark-decontamination test (a 13-gram
    collision between a training document and an eval question marks the
    document contaminated).

    Shape for 100 TB: eval sets are benchmark-sized (thousands of
    items), so their distinct gram ids are a few MB — the eval side
    aggregates down and BROADCASTS, and the corpus pays exactly one
    scan + explode with a map-side LeftSemi probe: no shuffle of corpus
    grams, ever.  The only exchange is the final distinct over hit ids,
    bounded by the number of contaminated documents.  The reference has
    no dedup surface at all (main.rs is scan→INSERT only)."""
    eval_grams = (
        eval_df.select(
            F.explode(word_ngrams(eval_text_col, n)).alias("__gram")
        )
        .select(_gram_id(F.col("__gram")).alias("__g"))
        .distinct()
    )
    return (
        corpus.select(
            id_col, F.explode(word_ngrams(text_col, n)).alias("__gram")
        )
        .select(id_col, _gram_id(F.col("__gram")).alias("__g"))
        .join(F.broadcast(eval_grams), "__g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus,
    eval_df,
    n: int = DECONTAM_NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    mode: str = "drop",
):
    """Remove (``mode='drop'``) or flag (``mode='flag'``, boolean
    ``contaminated`` column) corpus documents that share a word
    ``n``-gram with ``eval_df`` — see :func:`contaminated_ids`."""
    hits = contaminated_ids(corpus, eval_df, n, id_col, text_col, eval_text_col)
    if mode == "drop":
        return corpus.join(hits, id_col, "left_anti")
    if mode == "flag":
        flagged = hits.withColumn("contaminated", F.lit(True))
        return corpus.join(flagged, id_col, "left").withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")


# ---- DuckDB SQL twins (kept adjacent so formulas never drift) ----------


def sql_word_ngram_ids(
    table: str,
    n: int = DECONTAM_NGRAM_N,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB subquery yielding ``({id_expr}, __g)`` word-n-gram 60-bit
    ids — the twin of :func:`word_ngrams` + :func:`_gram_id` (same
    md5 construction as dedup.UNIT_ID_SQL).  List slice ``t[i:i+n-1]``
    is DuckDB's inclusive 1-based slice = Spark ``slice(toks, i, n)``;
    ``generate_series(1, 0)`` is empty in DuckDB, matching the
    ``size >= n`` guard on the Spark side."""
    from .dedup import UNIT_ID_SQL

    gram = f"array_to_string(t[i:i+{n - 1}], ' ')"
    return (
        f"SELECT {id_expr}, {UNIT_ID_SQL.format(col=gram)} AS __g "
        f"FROM (SELECT {id_expr}, string_split({text_expr}, ' ') AS t FROM {table}), "
        f"UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)"
    )


def sql_fingerprint(text_expr: str = "text", prefix: int = FINGERPRINT_PREFIX) -> str:
    return (
        f"list_reduce(list_transform(range(1, least(length({text_expr}), {prefix}) + 1), "
        f"i -> CAST(ascii({text_expr}[i:i]) AS BIGINT)), "
        f"(acc, c) -> (acc * {FINGERPRINT_MUL} + c) % {FINGERPRINT_MOD})"
    )


def sql_lang_score(lang: str, text_expr: str = "text") -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(list_distinct(string_split({text_expr}, ' ')), "
        f"t -> t IN ({markers})))"
    )


def sql_lang_id(text_expr: str = "text") -> str:
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"{sql_lang_score(lang, text_expr)} >= {sql_lang_score(other, text_expr)}"
            for other in langs[i + 1 :]
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"


def normalize_text(text_col: str = "text") -> Column:
    """Canonical text form for dedup/quality: lowercase, collapse runs
    of whitespace to single spaces, trim.  Pure JVM expressions — safe
    in the scan projection of any pipeline."""
    c = F.lower(F.col(text_col))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# Conservative, line-anchored patterns: the goal is scrubbing obvious
# contact strings from training text, not a compliance-grade detector.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
)


def scrub_pii(text_col: str = "text") -> Column:
    """Replace email/IP/phone shapes with typed placeholder tokens —
    chained ``regexp_replace`` (one codegen stage, no Python).  Order
    matters: emails first so their digit runs can't half-match the
    phone pattern."""
    c = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def remove_boilerplate_lines(
    df,
    max_doc_frac: float = 0.05,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
):
    """Drop lines that repeat across more than ``max_doc_frac`` of the
    corpus (nav bars, cookie banners, license footers) and reassemble
    each document in original line order — the CCNet-style paragraph
    dedup that removes boilerplate WITHOUT dropping whole documents.

    Plan shape at 100 TB: posexplode to (doc, pos, line); line
    frequency is ONE aggregate at md5(line) grain (map-side combined —
    boilerplate is by definition low-cardinality relative to the
    corpus); the corpus-size scalar rides in as a broadcast one-row
    cross join; the verdict joins back at line grain; reassembly is one
    per-doc aggregate ordered by the carried ``pos`` (array_sort on
    (pos, line) structs — no window).  Documents whose every line is
    boilerplate come back as empty strings, preserving corpus
    cardinality for downstream joins."""
    lines = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    freq = (
        lines.select(id_col, F.md5("line").alias("lh"))
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("n_docs_with_line"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        freq.crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("n_docs_with_line") >= min_docs)
            & (
                F.col("n_docs_with_line")
                > F.col("n_docs") * F.lit(max_doc_frac)
            )
        )
        .select("lh")
    )
    kept = lines.join(
        boiler, F.md5(F.col("line")) == F.col("lh"), "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    other_cols = [c for c in df.columns if c != text_col]
    return (
        df.select(*other_cols)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        .select(*df.columns)
    )


def chunk_documents(
    df,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split long documents into overlapping whitespace-token windows —
    the standard long-document prep for a fixed-context trainer
    (RAG-style chunking with stride = chunk − overlap; the final,
    shorter window is kept so no tail text is lost).

    One row in → ceil(max(n − overlap, 1) / stride) rows out with
    ``(id_col, chunk_id, chunk_text, n_tokens)``; every other column
    passes through, so chunks keep their provenance (lang, source).

    Plan shape at 100 TB: tokenization, window starts (``sequence``),
    window slices (``transform`` + ``slice`` + ``concat_ws``), and the
    explode are ALL per-row higher-order expressions inside the scan
    projection — zero shuffles, zero Python, and the fan-out rides the
    existing partitioning (explode never repartitions).
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap_tokens}) must be < chunk ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")

    # the token array is BOUND as a lambda variable before the per-chunk
    # slice (see word_ngrams): a lambda body referencing the split
    # expression directly would re-tokenize the document once per chunk.
    def build(a: Column) -> Column:
        # last start s satisfies s < n - overlap (so every chunk carries
        # at least one NEW token); single short doc -> one chunk at 0
        last_start = F.greatest(
            (F.size(a) - F.lit(overlap_tokens + 1)), F.lit(0)
        )
        starts = F.sequence(F.lit(0), last_start, F.lit(stride))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / F.lit(stride)).cast("long").alias("chunk_id"),
                F.concat_ws(
                    " ", F.slice(a, s + 1, chunk_tokens)
                ).alias("chunk_text"),
            ),
        )

    # NULL text must yield a NULL chunk array (explode_outer keeps the
    # row): unguarded, greatest(NULL, 0) skips the NULL and returns 0,
    # so a start-0 chunk is built whose NULL slice concat_ws renders as
    # '' — a phantom empty chunk
    chunks = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
        F.element_at(F.transform(F.array(toks), build), 1)
    )
    other = [c for c in df.columns if c != text_col]
    # explode_outer: a NULL-text document yields ONE row with NULL
    # chunk columns instead of silently vanishing — corpus cardinality
    # is preserved for downstream joins (same contract as
    # remove_boilerplate_lines)
    return (
        df.select(*other, F.explode_outer(chunks).alias("__c"))
        .select(
            *other,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col("__c.chunk_text").alias("chunk_text"),
        )
        .withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")).cast("long"))
    )


def shuffle_deterministic(df, id_col: str, salt: int = 0):
    """Deterministic global permutation of a corpus — the "shuffle the
    training set" step, reproducible across runs, engines, and cluster
    sizes (``df.orderBy(rand())`` is none of those).

    Orders by the same Knuth multiplicative hash the sampling operators
    use (operators.hash_sample), salted so successive epochs get
    decorrelated permutations.  A global sort is the scale-correct
    shuffle on Spark: range-partition on the hash (sampled boundaries)
    + per-partition local sort — no single-partition funnel, and the
    output is stably ordered for a downstream sequential writer."""
    if not 0 <= salt < 2**31:
        # Same guard as operators.assign_splits: Spark's % follows the
        # dividend's sign, so a negative salt would collapse the
        # permutation.
        raise ValueError(f"salt must be in [0, 2^31), got {salt}")
    # Salted id reduced mod 2^31 BEFORE the multiply so the product stays
    # <= (2^31-1)*2654435761 < 2^63 — no ANSI ARITHMETIC_OVERFLOW for any
    # in-range id/salt (same fix as operators.assign_splits/hash_sample).
    key = F.pmod(
        F.pmod(
            F.pmod(F.col(id_col), F.lit(2147483648)) + F.lit(salt),
            F.lit(2147483648),
        )
        * F.lit(2654435761),
        F.lit(4294967296),
    )
    return df.orderBy(key, F.col(id_col))


def repetition_features(
    text_col: str = "text",
    line_sep: str = "\n",
    ngram_n: int = 2,
) -> list[Column]:
    """Within-document repetition signals (the Gopher-rule family:
    duplicate lines / duplicate words / top-n-gram share) — the other
    half of quality filtering next to :func:`quality_features`'s
    length/stopword/punctuation axes.  Repetitive docs (boilerplate
    spam, keyword stuffing, degenerate model output) score high here
    and get filtered before training.

    All per-row higher-order expressions in the scan projection — no
    explode, no shuffle.  ``top_ngram_share`` takes the longest run in
    the SORTED n-gram array (run-length boundaries, O(n log n) per doc),
    with the token/ngram arrays bound as lambda variables (see
    word_ngrams) — the naive nested ``filter(ngrams, x == g)`` count
    re-built the n-gram array (itself re-slicing the token array) once
    per distinct gram, O(len³) per doc.  Empty/NULL text yields NULL
    features (filter decisions stay explicit downstream)."""
    c = F.col(text_col)
    lines = F.split(c, line_sep)
    toks = F.split(c, " ")
    n_lines = F.size(lines)
    n_toks = F.size(toks)

    def ngrams_from(a: Column) -> Column:
        return F.filter(
            F.transform(
                a,
                lambda _t, i: F.concat_ws(" ", F.slice(a, i + 1, ngram_n)),
            ),
            lambda _g, i: i < F.size(a) - F.lit(ngram_n - 1),
        )

    def max_run(srt: Column) -> Column:
        # longest run of equal adjacent elements in a sorted array:
        # 1-based run-start positions, max gap between consecutive
        # starts (size+1 sentinel closes the last run)
        def from_starts(st: Column) -> Column:
            return F.array_max(
                F.transform(
                    F.sequence(F.lit(1), F.size(st)),
                    lambda k: F.coalesce(
                        F.try_element_at(st, k + 1), F.size(srt) + 1
                    )
                    - F.try_element_at(st, k),
                )
            )

        starts = F.filter(
            F.sequence(F.lit(1), F.size(srt)),
            lambda i: (i == 1)
            | (F.try_element_at(srt, i) != F.try_element_at(srt, i - 1)),
        )
        return F.element_at(F.transform(F.array(starts), from_starts), 1)

    def top_share_from(a: Column) -> Column:
        def from_ngrams(g: Column) -> Column:
            return F.when(
                F.size(g) > 0,
                F.element_at(
                    F.transform(F.array(F.array_sort(g)), max_run), 1
                ).cast("double")
                / F.size(g),
            )

        return F.element_at(
            F.transform(F.array(ngrams_from(a)), from_ngrams), 1
        )

    guard = c.isNotNull() & (n_toks > 0)
    dup_line_frac = F.when(
        c.isNotNull() & (n_lines > 0),
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    )
    dup_word_frac = F.when(
        guard,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_toks,
    )
    top_share = F.when(
        guard,
        F.element_at(F.transform(F.array(toks), top_share_from), 1),
    )
    return [
        dup_line_frac.alias("dup_line_frac"),
        dup_word_frac.alias("dup_word_frac"),
        top_share.alias(f"top_{ngram_n}gram_share"),
    ]


# --------------------------------------------------- char n-gram LM ----

# Fixed-point scale for per-gram log-probs: summed as int64 so the
# per-doc mean is order-independent (the same determinism contract as
# the centroid/statistics fixed-point sums elsewhere in the repo).
LM_SCALE = 1_000_000_000


def _all_char_ngrams(text_col: str, n: int) -> Column:
    """ALL character n-grams of a text, WITH multiplicity — the language
    model unit (``dedup.char_ngrams`` deduplicates for shingling; a
    count model must not).  Same short-text guard: Spark's
    ``sequence(1, 0)`` is the descending ``[1, 0]``, not empty."""
    grams = F.expr(
        f"transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n}))"
    )
    return F.when(F.length(F.col(text_col)) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def train_char_lm(
    corpus: DataFrame, n: int = 3, text_col: str = "text"
) -> tuple[DataFrame, int]:
    """Train a character ``n``-gram count model over a corpus.

    Returns ``(lm, vocab_size)`` where ``lm`` has one row per observed
    (context, next-char) pair: ``(ctx string, ch string, c long,
    ctx_total long)``.  Probabilities are NOT baked in — smoothing
    happens at scoring time (:func:`score_char_lm`), so one trained
    table serves any ``alpha``.

    The 100 TB shape: one explode + one (ctx, ch)-grain count — a
    map-side-combinable aggregate whose reduce side is bounded by the
    model size (≤ |charset|^n rows, independent of corpus size; for
    n=3 over normalized text this is thousands of rows, trivially
    broadcastable at scoring time).  No driver materialization beyond
    the single vocab-size scalar."""
    grams = corpus.select(
        F.explode(_all_char_ngrams(text_col, n)).alias("gram")
    )
    split = grams.select(
        F.substring("gram", 1, n - 1).alias("ctx"),
        F.substring("gram", n, 1).alias("ch"),
    )
    counts = split.groupBy("ctx", "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("ctx").agg(F.sum("c").alias("ctx_total"))
    vocab_size = counts.select("ch").distinct().count()
    return counts.join(totals, "ctx"), vocab_size


def score_char_lm(
    docs: DataFrame,
    lm: DataFrame,
    vocab_size: int,
    n: int = 3,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality score: add-``alpha``-smoothed bits per
    character of each document under the trained char-LM — THE standard
    LLM-corpus quality filter (low bpc = fluent/repetitive text under
    the training distribution; high bpc = noise, wrong language,
    binary-ish junk).

    Per-gram ``log p = ln((c + alpha) / (ctx_total + alpha·V))`` with
    ``c``/``ctx_total`` falling back to 0 for unseen pairs/contexts (an
    unseen context scores the uniform ``1/V`` floor).  Returns
    ``(doc_id, n_grams, bpc)``; docs shorter than ``n`` get NULL bpc.

    Scale shape: explode (linear; ``explode_outer`` keeps sub-``n``
    docs in-stream as a NULL gram row, so no reattach join is ever
    needed — the plan is scan → two broadcast joins → ONE per-doc
    aggregate, plan-pinned in test_plans), TWO broadcast joins against
    the bounded model (the corpus never shuffles for them), and a
    per-doc mean whose sum is int64 fixed-point (``LM_SCALE``) so it is
    bit-stable under any row order."""
    totals = lm.select("ctx", "ctx_total").distinct()
    counts = lm.select("ctx", "ch", "c")
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(_all_char_ngrams(text_col, n)).alias("gram"),
    ).select(
        id_col,
        F.substring("gram", 1, n - 1).alias("ctx"),
        F.substring("gram", n, 1).alias("ch"),
    )
    joined = (
        grams.join(F.broadcast(totals), "ctx", "left")
        .join(F.broadcast(counts), ["ctx", "ch"], "left")
        .select(
            id_col,
            F.when(
                F.col("ctx").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
                    / (
                        F.coalesce(F.col("ctx_total"), F.lit(0))
                        + F.lit(float(alpha) * vocab_size)
                    )
                ),
            ).alias("logp"),
        )
    )
    # count("logp") skips the NULL rows explode_outer kept for sub-n
    # docs, so they land with n_grams=0 / NULL bpc without a re-join.
    n_grams = F.count("logp")
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        F.when(
            n_grams > 0,
            -F.sum(F.round(F.col("logp") * LM_SCALE).cast("long")).cast(
                "double"
            )
            / (F.lit(float(LM_SCALE)) * n_grams)
            / F.lit(float(__import__("math").log(2))),
        ).alias("bpc"),
    )


def sql_char_lm_bpc(
    docs_rel: str,
    n: int = 3,
    alpha: float = 0.5,
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of train-on-X/score-X :func:`train_char_lm` +
    :func:`score_char_lm` (same smoothing, same fixed-point mean) for
    oracle checks.  Engines' ``ln`` may differ in the last ulp, so
    equivalence tests compare bpc with a tolerance rather than a hash."""
    grams = (
        f"SELECT doc_id, substr(txt, CAST(i AS INT), {n - 1}) AS ctx, "
        f"substr(txt, CAST(i AS INT) + {n - 1}, 1) AS ch FROM ("
        f"SELECT {id_expr} AS doc_id, {text_expr} AS txt, "
        f"unnest(range(1, length({text_expr}) - {n - 2})) AS i "
        f"FROM {docs_rel} WHERE length({text_expr}) >= {n})"
    )
    return f"""
    WITH grams AS ({grams}),
    counts AS (SELECT ctx, ch, COUNT(*) AS c FROM grams GROUP BY 1, 2),
    totals AS (SELECT ctx, SUM(c) AS ctx_total FROM counts GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT ch) AS vs FROM counts),
    scored AS (
      SELECT g.doc_id,
             ln((COALESCE(c.c, 0) + {alpha}) /
                (COALESCE(t.ctx_total, 0) + {alpha} * v.vs)) AS logp
      FROM grams g CROSS JOIN v
      LEFT JOIN totals t USING (ctx)
      LEFT JOIN counts c USING (ctx, ch)
    )
    SELECT doc_id, COUNT(*) AS n_grams,
           -CAST(SUM(CAST(round(logp * 1000000000) AS BIGINT)) AS DOUBLE)
             / (1000000000.0 * COUNT(*)) / ln(2) AS bpc
    FROM scored GROUP BY doc_id
    """


def normalize_unicode(text_col: str = "text", form: str = "NFKC") -> Column:
    """Unicode normalization (NFKC by default — the SentencePiece
    pre-tokenization convention: full-width forms, ligatures, and
    compatibility characters collapse to their canonical ASCII-ish
    equivalents; composed and decomposed accents unify).

    This is a DELIBERATE Python boundary: Spark has no builtin Unicode
    normalizer, and stdlib ``unicodedata`` is the reference
    implementation — a vectorized Arrow-batched pandas UDF, scan-level,
    no shuffle.  Compose with :func:`normalize_text` (which handles
    case/whitespace JVM-side) for the full canonical form."""
    import unicodedata

    import pandas as pd  # noqa: F401 (resolves the UDF type hints)

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm_fn(texts):
        return texts.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    _norm_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _norm = F.pandas_udf(_norm_fn, "string")

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _norm(c)


# Order matters: "&amp;" decodes LAST so "&amp;lt;" yields the literal
# "&lt;" (one decode pass, never two).
_MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)
_MARKUP_PATTERNS: tuple[str, ...] = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<!--.*?-->",
    r"(?is)</?[a-z!][^>]*>",
)


def strip_markup(text_col: str = "text") -> Column:
    """HTML/markup removal — the web-text extraction step of a crawl
    pipeline: script/style blocks and comments die with their content,
    tags become whitespace (so ``a<br>b`` keeps its word boundary),
    common entities decode once, whitespace collapses.

    Pure JVM regexp chain, scan-level; patterns live in the
    Java-regex/RE2 common subset so :func:`sql_strip_markup` is the
    exact DuckDB twin.  A conservative extractor, not a parser — the
    goal is training-text hygiene, not DOM fidelity."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat in _MARKUP_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    for ent, ch in _MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def sql_strip_markup(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`strip_markup` (same patterns, same order)."""
    c = text_expr
    for pat in _MARKUP_PATTERNS:
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    for ent, ch in _MARKUP_ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
