"""Learned data selection: a fastText-style linear quality classifier and
DSIR-style importance resampling.

The reference (a 210-line parquet->Postgres ETL, ``src/main.rs``) has no
learned selection; these operators come from the public training-data-
curation literature: the hashed-bag-of-words linear classifier used as a
web-corpus quality filter (the fastText recipe), and Data Selection via
Importance Resampling (hashed n-gram LM likelihood ratios + Gumbel-top-k
sampling).

Scale shapes (the 100 TB story):

- **Feature hashing** is scan-level (higher-order functions over the
  token array, no shuffle, no Python).  Feature ids reuse the md5-derived
  60-bit construction from ``dedup.unit_id`` so every hashing step has an
  exact DuckDB SQL twin.
- **Classifier training** is full-batch gradient descent where the only
  distributed work per iteration is one pass over a cached, pre-
  partitioned feature table: broadcast-join the (<= dim+1)-row weight
  vector, a per-doc window sum (no exchange — the cache's partitioning
  and sort order satisfy the window), then a map-side-combinable
  ``groupBy(feat)`` whose reduce side is bounded by the MODEL size, not
  the corpus.  The driver materializes only the gradient (<= dim+1 rows
  per iteration) — the same bounded-model-statistic pattern as
  ``bpe.train_bpe`` and k-means.
- **Scoring** has two paths: a JVM explode + broadcast-weight join +
  per-doc aggregate (one corpus shuffle), and a scan-level Arrow-batched
  pandas UDF over the pre-built feature arrays (ZERO shuffle — the
  production path for full-corpus filtering; the model is ~(dim+1)*8
  bytes in the closure).  Both compute the identical int64 fixed-point
  margin, so they are bit-equal and interchangeable.
- **DSIR** is two bounded hashed-n-gram profiles (reduce side <= dim
  buckets), a broadcast log-ratio join against the corpus (corpus never
  shuffles to be scored), and a deterministic Gumbel-top-k resample via
  ``TakeOrderedAndProject`` — no global sort materialization.

All per-doc float sums are int64 fixed-point (``text.LM_SCALE``) so
results are bit-stable under any partitioning or row order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import UNIT_ID_SQL
from .text import LM_SCALE, _gram_id, word_ngrams

HASH_DIM = 1 << 15
_KNUTH = 2654435761
_M31 = 2147483648  # 2^31
_M32 = 4294967296  # 2^32


def _norm_tokens(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped (so leading/trailing
    whitespace and runs of separators produce no phantom token)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(c), r"\s+"), lambda t: t != F.lit("")
    )


def feature_ids(
    text_col: Column | str, dim: int = HASH_DIM, ns: tuple[int, ...] = (1,)
) -> Column:
    """Array of hashed feature ids, one per word-n-gram OCCURRENCE
    (multiplicity preserved), for each n in ``ns``.

    id = (60-bit md5 gram id) mod ``dim`` — nonnegative, so Spark ``pmod``
    and DuckDB ``%`` agree (:func:`sql_feature_ids` is the exact twin).
    Scan-level: no shuffle, no Python."""
    toks = _norm_tokens(text_col)
    joined = F.concat_ws(" ", toks)
    empty = F.array().cast("array<bigint>")
    arrs = []
    for n in ns:
        grams = word_ngrams(joined, n)
        ids = F.transform(grams, lambda g: F.pmod(_gram_id(g), F.lit(dim)))
        # guard: "" splits to [""], which word_ngrams would count as one
        # token — an empty doc must yield no features at any n.
        arrs.append(F.when(F.size(toks) >= n, ids).otherwise(empty))
    return F.concat(*arrs) if len(arrs) > 1 else arrs[0]


def featurize(
    df: DataFrame,
    text_col: str = "text",
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1,),
    out_col: str = "features",
) -> DataFrame:
    """Hashed bag-of-words features: sorted ``array<struct<feat,x>>``
    with x = occurrence count / total occurrences (L1-normalized term
    frequency, so short and long documents are comparable) plus a
    constant bias feature at index ``dim`` with x = 1.

    Built entirely with higher-order functions over the token array —
    scan-level, zero shuffle.  Counts come from run-length boundaries
    over the SORTED id array, with every intermediate array bound as a
    lambda variable (the ``transform(array(...), v -> ...)`` wrapper):
    HOFs are interpreted with no subexpression elimination inside lambda
    bodies, so a naive ``filter(ids, i -> i == d)`` count would re-hash
    the whole document once per distinct token — O(distinct·total)
    md5 calls per doc (a measured ~25x slowdown at sf0.1).  Bound
    variables make it O(total·log total) comparisons on longs."""
    ids = feature_ids(text_col, dim, ns)
    empty = F.array().cast("array<struct<feat:bigint,x:double>>")

    def feats_from(srt: Column, st: Column) -> Column:
        # st holds the 1-based positions where a new run starts; run k
        # spans [st[k], st[k+1]) with an implicit size+1 sentinel.
        return F.transform(
            F.sequence(F.lit(1), F.size(st)),
            lambda k: F.struct(
                F.try_element_at(srt, F.try_element_at(st, k)).alias(
                    "feat"
                ),
                (
                    (
                        F.coalesce(
                            F.try_element_at(st, k + 1), F.size(srt) + 1
                        )
                        - F.try_element_at(st, k)
                    )
                    / F.size(srt)
                )
                .cast("double")
                .alias("x"),
            ),
        )

    def from_sorted(srt: Column) -> Column:
        starts = F.filter(
            F.sequence(F.lit(1), F.size(srt)),
            lambda i: (i == 1)
            | (
                F.try_element_at(srt, i)
                != F.try_element_at(srt, i - 1)
            ),
        )
        return F.element_at(
            F.transform(F.array(starts), lambda st: feats_from(srt, st)), 1
        )

    def from_ids(a: Column) -> Column:
        return F.when(
            F.size(a) > 0,
            F.element_at(
                F.transform(F.array(F.array_sort(a)), from_sorted), 1
            ),
        ).otherwise(empty)

    tf = F.element_at(F.transform(F.array(ids), from_ids), 1)
    bias = F.array(
        F.struct(
            F.lit(dim).cast("bigint").alias("feat"),
            F.lit(1.0).alias("x"),
        )
    )
    return df.withColumn(out_col, F.concat(tf, bias))


def _fixed(col: Column) -> Column:
    """int64 fixed-point of a double at LM_SCALE (HALF_UP, matching
    ``F.round``) — summable in any order with bit-stable results."""
    return F.round(col * F.lit(float(LM_SCALE))).cast("long")


@dataclass
class LinearModel:
    """Trained linear classifier: ``weights[dim]`` is the bias."""

    weights: np.ndarray
    dim: int
    ns: tuple[int, ...]
    losses: list[float] = field(default_factory=list)

    def nonzero_weights_df(self, spark: SparkSession) -> DataFrame:
        nz = np.nonzero(self.weights)[0]
        rows = [(int(i), float(self.weights[i])) for i in nz]
        return spark.createDataFrame(rows, "feat bigint, w double")


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1,),
    n_iter: int = 40,
    lr: float = 2.0,
    l2: float = 0.0,
) -> LinearModel:
    """Train a logistic-regression quality classifier (labels 0/1) by
    full-batch gradient descent — the fastText-style linear filter used
    to score web text against a high-quality seed corpus.

    Deterministic: the margin and every gradient component are int64
    fixed-point sums, so the learned weights are bit-identical across
    runs, partitionings, and cluster sizes.

    Per-iteration distributed shape (see module docstring): one cached
    scan -> broadcast weight join -> per-doc window sum (no exchange) ->
    model-bounded groupBy(feat) -> <= dim+1 row collect.  The corpus is
    shuffled ONCE (the upfront repartition by doc) for the whole run."""
    spark = df.sparkSession
    rows = (
        featurize(df, text_col=text_col, dim=dim, ns=ns)
        .select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("double").alias("__y"),
            F.explode("features").alias("f"),
        )
        .select("__id", "__y", F.col("f.feat").alias("feat"), F.col("f.x").alias("x"))
        .repartition("__id")
        .sortWithinPartitions("__id", "feat")
        .persist()
    )
    try:
        n_docs = rows.where(F.col("feat") == dim).count()
        if n_docs == 0:
            raise ValueError("empty training set")
        win = Window.partitionBy("__id")
        w = np.zeros(dim + 1)
        losses: list[float] = []
        for _ in range(n_iter):
            wdf = LinearModel(w, dim, ns).nonzero_weights_df(spark)
            j = rows.join(F.broadcast(wdf), "feat", "left")
            margin = F.sum(
                _fixed(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x"))
            ).over(win) / F.lit(float(LM_SCALE))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            resid = p - F.col("__y")
            # log-loss contribution rides on the bias row (exactly one
            # per doc) so loss costs no extra pass.
            loss_term = F.when(
                F.col("feat") == dim,
                _fixed(
                    -F.col("__y") * F.log(F.greatest(p, F.lit(1e-12)))
                    - (F.lit(1.0) - F.col("__y"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                ),
            )
            agg = (
                j.select(
                    "feat",
                    _fixed(resid * F.col("x")).alias("g"),
                    loss_term.alias("l"),
                )
                .groupBy("feat")
                .agg(F.sum("g").alias("g"), F.sum("l").alias("l"))
                .collect()
            )
            grad = np.zeros(dim + 1)
            loss_fix = 0
            for r in agg:
                grad[r["feat"]] = r["g"] / LM_SCALE
                if r["l"] is not None:
                    loss_fix += r["l"]
            losses.append(loss_fix / LM_SCALE / n_docs)
            w = w - lr * (grad / n_docs + l2 * w)
        return LinearModel(w, dim, tuple(ns), losses)
    finally:
        rows.unpersist()


def score_quality(
    df: DataFrame,
    model: LinearModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """JVM scoring path: explode features, broadcast-join the nonzero
    weights, per-doc int64 fixed-point margin sum, sigmoid.

    Returns ``(id_col, margin, prob)``.  Costs one corpus shuffle (the
    per-doc aggregate); :func:`score_quality_pandas` is the zero-shuffle
    twin and returns bit-identical values."""
    spark = df.sparkSession
    wdf = model.nonzero_weights_df(spark)
    feats = featurize(
        df, text_col=text_col, dim=model.dim, ns=model.ns
    ).select(id_col, F.explode("features").alias("f"))
    j = feats.join(
        F.broadcast(wdf), feats["f.feat"] == wdf["feat"], "left"
    )
    margin = (
        F.sum(_fixed(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("f.x")))
        / F.lit(float(LM_SCALE))
    ).alias("margin")
    out = j.groupBy(id_col).agg(margin)
    return out.select(
        id_col,
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("prob"),
    )


def score_quality_pandas(
    df: DataFrame,
    model: LinearModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Zero-shuffle scoring path: features are built scan-level JVM-side,
    then a vectorized pandas UDF computes the int64 fixed-point margin
    against the in-closure weight vector ((dim+1)*8 bytes, shipped once
    per worker).  The sigmoid is applied JVM-side so the output is
    bit-identical to :func:`score_quality` — same longs, same exp.

    This is the production path for full-corpus filtering: the plan is
    scan -> project -> ArrowEval -> project, no exchange anywhere."""
    weights = model.weights.copy()
    scale = float(LM_SCALE)

    @F.pandas_udf("double")
    def _margin(feats: pd.Series, xs: pd.Series) -> pd.Series:
        out = np.empty(len(feats), dtype=np.float64)
        for i in range(len(feats)):
            f = np.asarray(feats.iloc[i], dtype=np.int64)
            x = np.asarray(xs.iloc[i], dtype=np.float64)
            v = weights[f] * x * scale
            # HALF_UP like F.round: away from zero at .5
            fixed = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            out[i] = fixed.sum() / scale
        return pd.Series(out)

    feats = featurize(df, text_col=text_col, dim=model.dim, ns=model.ns)
    out = feats.select(
        id_col,
        _margin(F.col("features.feat"), F.col("features.x")).alias("margin"),
    )
    return out.select(
        id_col,
        "margin",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("prob"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling
# --------------------------------------------------------------------------


def hashed_ngram_profile(
    df: DataFrame,
    text_col: str = "text",
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Hashed n-gram occurrence counts ``(feat, cnt)`` — the sufficient
    statistic for a hashed unigram/bigram LM.  Reduce side is bounded by
    ``dim`` buckets regardless of corpus size."""
    ids = feature_ids(text_col, dim, ns)
    return (
        df.select(F.explode(ids).alias("feat"))
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@dataclass
class ImportanceModel:
    """Per-bucket log likelihood ratios ln p_target(f) - ln p_raw(f),
    add-``alpha``-smoothed over ``dim`` buckets; ``default_logr`` is the
    ratio for buckets observed in neither profile."""

    ratios: DataFrame
    default_logr: float
    dim: int
    ns: tuple[int, ...]
    alpha: float


def importance_log_ratios(
    target_profile: DataFrame,
    raw_profile: DataFrame,
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
) -> ImportanceModel:
    """Fit the DSIR importance model from two hashed-n-gram profiles.
    Driver work is two scalar totals; the ratio table stays distributed
    (<= dim rows, broadcastable at scoring time)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t_total = target_profile.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = raw_profile.agg(F.sum("cnt")).collect()[0][0] or 0
    t_denom = float(t_total) + alpha * dim
    r_denom = float(r_total) + alpha * dim
    t = target_profile.select("feat", F.col("cnt").alias("t_cnt"))
    r = raw_profile.select("feat", F.col("cnt").alias("r_cnt"))
    ratios = t.join(r, "feat", "full_outer").select(
        "feat",
        (
            F.log(
                (F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(alpha))
                / F.lit(t_denom)
            )
            - F.log(
                (F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(alpha))
                / F.lit(r_denom)
            )
        ).alias("logr"),
    )
    default_logr = math.log(alpha / t_denom) - math.log(alpha / r_denom)
    return ImportanceModel(ratios, default_logr, dim, tuple(ns), alpha)


def score_importance(
    df: DataFrame,
    model: ImportanceModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance log-weight: sum of per-occurrence bucket
    log-ratios.  Returns ``(id_col, n_feats, logw)``; a doc with no
    features scores logw = 0 (the empty product).

    Scale shape (same as ``text.score_char_lm``): ``explode_outer`` keeps
    empty docs in-stream, ONE broadcast join against the bounded ratio
    table (the corpus never shuffles to be scored), one per-doc
    fixed-point aggregate."""
    ids = feature_ids(text_col, model.dim, model.ns)
    ex = df.select(F.col(id_col), F.explode_outer(ids).alias("feat"))
    j = ex.join(F.broadcast(model.ratios), "feat", "left").select(
        id_col,
        F.when(
            F.col("feat").isNotNull(),
            F.coalesce(F.col("logr"), F.lit(model.default_logr)),
        ).alias("logr"),
    )
    n_feats = F.count("logr")
    return j.groupBy(id_col).agg(
        n_feats.alias("n_feats"),
        F.when(
            n_feats > 0,
            F.sum(_fixed(F.col("logr"))).cast("double")
            / F.lit(float(LM_SCALE)),
        )
        .otherwise(F.lit(0.0))
        .alias("logw"),
    )


def _is_integral(dt: T.DataType) -> bool:
    """Whether ``pmod(id, 2^31)`` is exact for this type: the integer
    family, plus scale-0 decimals (an integral value stored as
    decimal(p, 0) reduces identically)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return True
    return isinstance(dt, T.DecimalType) and dt.scale == 0


def _reduced_id(df: DataFrame, id_col: str) -> Column:
    """The id reduced into [0, 2^31) for the salted Knuth pipeline.

    Integral ids — the integer family plus scale-0 decimals — keep the
    direct ``pmod(id, 2^31)`` reduction (stable across rounds —
    existing sample pins depend on it).  Any other type (string doc
    ids, uuids, fractional numerics whose pmod would be fractional)
    goes through ``xxhash64`` first: without this, ``pmod(string, N)``
    is NULL (or an ANSI cast error) and Gumbel-top-k silently
    degenerates to ordering by the raw weight (driver ADVICE r7
    finding).  The dtype is resolved case-insensitively against the
    schema (Spark resolves ``F.col("Doc_ID")`` fine; an exact-string
    dict lookup would silently misroute it to the hash path — driver
    ADVICE r8 finding)."""
    for f in df.schema.fields:
        if f.name.lower() == id_col.lower():
            if _is_integral(f.dataType):
                return F.pmod(F.col(id_col), F.lit(_M31))
            break
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(_M31))


# salt bound keeping (pmod + salt) * KNUTH below 2^63 is enforced by the
# mod-2^31 reduction, same discipline as operators.hash_sample.
def _gumbel(reduced_id: Column, salt: int) -> Column:
    """Deterministic Gumbel(0,1) noise from the salted Knuth hash of the
    reduced id (see :func:`_reduced_id`): u = (bucket + 0.5) / 2^32 in
    (0,1), g = -ln(-ln(u))."""
    bucket = F.pmod(
        F.pmod(reduced_id + F.lit(salt), F.lit(_M31)) * F.lit(_KNUTH),
        F.lit(_M32),
    )
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(_M32))
    return -F.log(-F.log(u))


def importance_resample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw",
    temperature: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic Gumbel-top-k sample of ``k`` docs with probability
    proportional to ``exp(weight / temperature)`` — the DSIR resampling
    step, reproducible across runs and cluster sizes (noise is the salted
    Knuth hash of the id, not an RNG).

    ``temperature -> 0`` degenerates to exact top-k by weight;
    ``temperature -> inf`` to a uniform deterministic sample.  Executes
    as ``TakeOrderedAndProject`` (partition-local top-k then merge), no
    global sort materialization."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not 0 <= salt < _M31:
        raise ValueError(f"salt must be in [0, 2^31), got {salt}")
    key = F.col(weight_col) / F.lit(float(temperature)) + _gumbel(
        _reduced_id(scored, id_col), salt
    )
    return scored.orderBy(key.desc(), F.col(id_col)).limit(k)


def importance_resample_by(
    scored: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw",
    temperature: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum Gumbel-top-k: ``k`` docs from EACH stratum (source,
    language, shard...) with probability proportional to
    ``exp(weight / temperature)`` within the stratum — the curriculum-
    mix variant of :func:`importance_resample`, equally deterministic.

    Executes as a rank window per stratum; Spark's WindowGroupLimit
    pushes the ``rank <= k`` bound into the partial phase (the same
    plan contract as the declared top_k_per_group query), so no
    stratum's full membership is ever sorted to completion."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not 0 <= salt < _M31:
        raise ValueError(f"salt must be in [0, 2^31), got {salt}")
    key = F.col(weight_col) / F.lit(float(temperature)) + _gumbel(
        _reduced_id(scored, id_col), salt
    )
    w = Window.partitionBy(strata_col).orderBy(key.desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# DuckDB SQL twins (oracle checks)
# --------------------------------------------------------------------------


def sql_feature_ids(
    table: str,
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1,),
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`feature_ids`, one row per occurrence:
    ``(__id, feat)``.  Same md5 60-bit construction (UNIT_ID_SQL), same
    lowercase-whitespace tokenization, same empty-doc guard (an empty
    generate_series when the doc has < n tokens)."""
    parts = []
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), '\\s+'), "
        "x -> x <> '')"
    )
    for n in ns:
        gram = f"array_to_string(t[i:i+{n - 1}], ' ')"
        parts.append(
            f"SELECT {id_expr} AS __id, "
            f"{UNIT_ID_SQL.format(col=gram)} % {dim} AS feat "
            f"FROM (SELECT {id_expr}, {toks} AS t FROM {table}), "
            f"UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0))) "
            "AS u(i)"
        )
    return " UNION ALL ".join(parts)


def sql_importance_logw(
    docs_rel: str,
    target_rel: str,
    raw_rel: str,
    dim: int = HASH_DIM,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of profile -> :func:`importance_log_ratios` ->
    :func:`score_importance`: ``(doc_id, n_feats, logw)``.  Same
    smoothing, same fixed-point per-doc sum; engines' ``ln`` differs in
    the last ulp, so equivalence tests compare logw with a tolerance."""
    tf = sql_feature_ids(target_rel, dim, ns, text_expr, id_expr)
    rf = sql_feature_ids(raw_rel, dim, ns, text_expr, id_expr)
    df_ = sql_feature_ids(docs_rel, dim, ns, text_expr, id_expr)
    return f"""
    WITH tp AS (SELECT feat, COUNT(*) AS c FROM ({tf}) GROUP BY 1),
    rp AS (SELECT feat, COUNT(*) AS c FROM ({rf}) GROUP BY 1),
    tt AS (SELECT COALESCE(SUM(c), 0) + {alpha} * {dim} AS d FROM tp),
    rt AS (SELECT COALESCE(SUM(c), 0) + {alpha} * {dim} AS d FROM rp),
    ratios AS (
      SELECT COALESCE(tp.feat, rp.feat) AS feat,
             ln((COALESCE(tp.c, 0) + {alpha}) / tt.d)
               - ln((COALESCE(rp.c, 0) + {alpha}) / rt.d) AS logr
      FROM tp FULL OUTER JOIN rp USING (feat) CROSS JOIN tt CROSS JOIN rt
    ),
    occ AS ({df_}),
    perdoc AS (
      SELECT o.__id,
             COUNT(*) AS n_feats,
             CAST(SUM(CAST(round(COALESCE(r.logr,
                    ln({alpha} / tt.d) - ln({alpha} / rt.d))
                  * {LM_SCALE}) AS BIGINT)) AS DOUBLE) / {LM_SCALE} AS logw
      FROM occ o LEFT JOIN ratios r USING (feat) CROSS JOIN tt CROSS JOIN rt
      GROUP BY 1
    )
    SELECT d.{id_expr} AS doc_id,
           COALESCE(p.n_feats, 0) AS n_feats,
           COALESCE(p.logw, 0.0) AS logw
    FROM {docs_rel} d LEFT JOIN perdoc p ON d.{id_expr} = p.__id
    """


# --------------------------------------------------------------------------
# Char-n-gram naive-Bayes language identification
# --------------------------------------------------------------------------


@dataclass
class LangIdModel:
    """Per-language char-n-gram counts: ``counts`` is a DataFrame
    ``(label, gram, c)``, ``totals`` maps label -> total gram count,
    ``vocab_size`` the distinct-gram count across all labels."""

    counts: DataFrame
    totals: dict[str, int]
    vocab_size: int
    n: int


def train_lang_id(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
) -> LangIdModel:
    """Train a naive-Bayes character n-gram language identifier — the
    classic statistical LID (a learned upgrade over the marker-word
    heuristic in ``text.lang_id``).

    Rows with a NULL label are ignored (they carry no supervision and
    would otherwise poison the sorted label list at prediction time).
    One explode + one (label, gram)-grain map-side-combinable count;
    the model is bounded by |charset|^n x |labels| rows regardless of
    corpus size, broadcastable at prediction time.  Driver work is the
    per-label totals (|labels| rows) and the vocab-size scalar."""
    from .text import _all_char_ngrams

    grams = df.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        F.explode(_all_char_ngrams(text_col, n)).alias("gram"),
    )
    counts = grams.groupBy("label", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = {
        r["label"]: int(r["t"])
        for r in counts.groupBy("label").agg(F.sum("c").alias("t")).collect()
    }
    if not totals:
        raise ValueError(
            "empty training set: no labeled document produced any "
            f"char {n}-gram"
        )
    vocab_size = counts.select("gram").distinct().count()
    return LangIdModel(counts, totals, vocab_size, n)


def predict_lang(
    df: DataFrame,
    model: LangIdModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-doc argmax-label naive-Bayes score: sum over the doc's char
    n-grams of ``ln((c_label + alpha) / (total_label + alpha*V))``.
    Returns ``(id_col, pred_lang, logp)``; docs shorter than ``n`` get
    NULL pred (no evidence).

    Scale shape: the doc grams cross the (bounded, broadcast) label
    list, join the (bounded, broadcast) count model, then ONE (doc,
    label) fixed-point aggregate and ONE per-doc struct-max — ties
    break on the lexicographically largest label, deterministically.
    ``explode_outer`` keeps gram-less docs (shorter than ``n`` / NULL
    text) in-stream as NULL-scoring rows — same no-reattach-join trick
    as ``text.score_char_lm`` — so the corpus never shuffles except for
    its own per-doc aggregate."""
    from .text import _all_char_ngrams

    spark = df.sparkSession
    labels = spark.createDataFrame(
        [(lab, tot) for lab, tot in sorted(model.totals.items())],
        "label string, total long",
    )
    grams = df.select(
        F.col(id_col),
        F.explode_outer(_all_char_ngrams(text_col, model.n)).alias("gram"),
    )
    scored = (
        grams.crossJoin(F.broadcast(labels))
        .join(F.broadcast(model.counts), ["label", "gram"], "left")
        .select(
            id_col,
            "label",
            F.when(
                F.col("gram").isNotNull(),
                _fixed(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                        / (
                            F.col("total")
                            + F.lit(alpha * model.vocab_size)
                        )
                    )
                ),
            ).alias("lp"),
        )
        .groupBy(id_col, "label")
        .agg(
            F.when(
                F.count("lp") > 0,
                F.sum("lp").cast("double") / F.lit(float(LM_SCALE)),
            ).alias("logp")
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("logp"), F.col("label"))).alias("__b")
    )
    return best.select(
        id_col,
        F.when(
            F.col("__b.logp").isNotNull(), F.col("__b.label")
        ).alias("pred_lang"),
        F.col("__b.logp").alias("logp"),
    )
