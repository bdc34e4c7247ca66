"""L8 UDF surface: the seven Python-boundary mechanisms, each on a
function with an exact SQL twin (integer outputs — no float drift).

- ``word_count_pudf``: vectorized pandas UDF (Arrow batches, the fast
  Python path).
- ``rolling_hash_udf``: row-at-a-time Python UDF (the slow path — kept
  for API parity and documented as such).
- ``rolling_hash_arrow_udf``: Arrow-optimized Python UDF
  (``useArrow=True`` — row-at-a-time ergonomics, Arrow transport).
- ``vocab_stats_grouped``: pandas UDAF via ``groupBy().applyInPandas``.
- ``fingerprint_map_in_arrow``: ``df.mapInArrow`` — raw pyarrow
  RecordBatches, no pandas layer (the multimodal decode shape).
- ``asof_join_cogrouped``: cogrouped ``applyInPandas`` — per-key pandas
  merge over two co-shuffled DataFrames (pd.merge_asof).
- ``chunk_documents_udtf``: Python UDTF under ``DataFrame.lateralJoin``
  — one input row fans out to N Python-generated rows (Spark 4 table
  functions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import FINGERPRINT_MOD, FINGERPRINT_MUL, FINGERPRINT_PREFIX


@F.pandas_udf(T.IntegerType())
def word_count_pudf(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over Arrow batches.

    Nullable Int32: on NULL text ``.str.len()`` yields NaN, which must
    map to NULL (as the SQL twin does), not raise in ``astype``."""
    return text.str.split(" ").str.len().astype("Int32")


@F.udf(T.LongType())
def rolling_hash_udf(text):
    """Row-at-a-time Python UDF twin of text.fingerprint (same formula).

    Deliberately un-hinted: PySpark tries to infer a *pandas* eval type
    from any signature hints on a plain ``@udf`` and warns when the
    hints are row-typed (str -> int), so the row UDF stays bare."""
    if text is None:
        return None
    h = 0
    for ch in text[:FINGERPRINT_PREFIX]:
        h = (h * FINGERPRINT_MUL + ord(ch)) % FINGERPRINT_MOD
    return h


GROUP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("vocab_size", T.LongType()),
    ]
)


def _vocab_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    vocab: set[str] = set()
    for t in pdf["text"]:
        vocab.update(t.split(" "))
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "total_chars": [int(pdf["n_chars"].sum())],
            "vocab_size": [len(vocab)],
        }
    )


def vocab_stats_grouped(documents: DataFrame) -> DataFrame:
    """Per-language corpus stats via applyInPandas (pandas UDAF).

    Integer outputs only — exact regardless of row order, so the oracle
    can hash-match a Python aggregation."""
    return (
        documents.select("lang", "text", "n_chars")
        .groupBy("lang")
        .applyInPandas(_vocab_stats, GROUP_STATS_SCHEMA)
    )


UDF_SURFACE_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("vocab_size", T.LongType()),
        T.StructField("total_words", T.LongType()),
        T.StructField("min_fp", T.LongType()),
    ]
)


def _surface_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    vocab: set[str] = set()
    for t in pdf["text"]:
        vocab.update(t.split(" "))
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "total_chars": [int(pdf["n_chars"].sum())],
            "vocab_size": [len(vocab)],
            "total_words": [int(pdf["n_words"].sum())],
            "min_fp": [int(pdf["fp"].min())],
        }
    )


def udf_surface_stats(documents: DataFrame) -> DataFrame:
    """All three Python-boundary mechanisms in ONE plan: the pandas UDF
    and the row UDF compute per-row columns, then applyInPandas (pandas
    UDAF) aggregates them per language.  Integer outputs only — exact
    regardless of row/partition order."""
    enriched = documents.select(
        "lang",
        "text",
        "n_chars",
        word_count_pudf("text").alias("n_words"),
        rolling_hash_udf("text").alias("fp"),
    )
    return enriched.groupBy("lang").applyInPandas(
        _surface_stats, UDF_SURFACE_SCHEMA
    )


@F.udf(T.LongType(), useArrow=True)
def rolling_hash_arrow_udf(text: str) -> int | None:
    """The FOURTH UDF kind: Arrow-optimized Python UDF (Spark 3.5+,
    ``useArrow=True``) — row-at-a-time author ergonomics, Arrow-batched
    (de)serialization instead of pickle, typically 1.5–2× the plain
    Python UDF on string-heavy rows.  Same formula as
    :func:`rolling_hash_udf` so equivalence is directly testable."""
    if text is None:
        return None
    h = 0
    for ch in text[:FINGERPRINT_PREFIX]:
        h = (h * FINGERPRINT_MUL + ord(ch)) % FINGERPRINT_MOD
    return h


def fingerprint_map_in_arrow(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The FIFTH UDF kind: ``df.mapInArrow`` — raw ``pyarrow``
    RecordBatches in and out, no pandas layer at all (Spark 3.5+).

    Lowest-overhead Python boundary for byte/array-heavy payloads: no
    pandas object conversion, zero-copy Arrow buffers both ways; the
    multimodal decode path (``llm/multimodal.py``) is where this shape
    earns its keep at scale.  Same rolling-hash formula as the other
    kinds so equivalence is directly testable (tests/test_equivalence).
    Partition-local, stateless — no shuffle is introduced."""
    import pyarrow as pa

    prefix, mul, mod = FINGERPRINT_PREFIX, FINGERPRINT_MUL, FINGERPRINT_MOD
    out_pa = pa.schema([("doc_id", pa.int64()), ("fp", pa.int64())])

    def _fp(t: str | None) -> int | None:
        if t is None:
            return None
        h = 0
        for ch in t[:prefix]:
            h = (h * mul + ord(ch)) % mod
        return h

    def _batches(it):
        for batch in it:
            cols = batch.to_pydict()
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": cols["doc_id"],
                    "fp": [_fp(t) for t in cols["text"]],
                },
                schema=out_pa,
            )

    sel = documents.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return sel.mapInArrow(_batches, "doc_id long, fp long")


ASOF_COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_ts", T.TimestampType()),
        T.StructField("click_ts", T.TimestampType()),
        T.StructField("click_value", T.DoubleType()),
    ]
)


def asof_join_cogrouped(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """The SIXTH Python-boundary kind: cogrouped ``applyInPandas`` —
    two DataFrames grouped on the same key, each key's pair of pandas
    frames handed to one Python function (``pd.merge_asof`` here).

    Same semantics as the declared ``join_asof`` query's JVM
    union-tag + window compose (latest same-user click at or before
    each purchase; equality pinned in tests/test_equivalence.py):
    ``merge_asof(direction='backward')`` IS the as-of contract.  Inputs
    follow the same tie discipline — ``clicks`` pre-reduced to one row
    per (user_id, ts).

    Scale shape: ONE co-partitioned shuffle on user_id for both sides,
    then per-key pandas merges (each user's history must fit one
    executor's memory — true for event data, and the reason the JVM
    window compose stays the production path; this is the escape hatch
    for per-key logic window functions cannot express).

    ``purchases``: (user_id, ts, purchase_id); ``clicks``:
    (user_id, ts, value)."""

    def _merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values(["ts", "purchase_id"]).reset_index(drop=True)
        if not len(left):
            return pd.DataFrame(
                columns=[f.name for f in ASOF_COGROUP_SCHEMA.fields]
            )
        if len(right):
            r = (
                right.sort_values("ts")[["ts", "value"]]
                .rename(columns={"ts": "click_ts", "value": "click_value"})
                .reset_index(drop=True)
            )
            out = pd.merge_asof(
                left, r, left_on="ts", right_on="click_ts",
                direction="backward",
            )
        else:
            out = left.assign(click_ts=pd.NaT, click_value=float("nan"))
        return pd.DataFrame(
            {
                "purchase_id": out["purchase_id"],
                "user_id": out["user_id"],
                "purchase_ts": out["ts"],
                "click_ts": out["click_ts"],
                "click_value": out["click_value"],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(_merge, ASOF_COGROUP_SCHEMA)
    )


@F.udtf(returnType="chunk_id: bigint, chunk_text: string, n_tokens: bigint")
class ChunkUdtf:
    """Python UDTF twin of ``text.chunk_documents`` — same whitespace
    tokens, stride, kept short tail, and NULL-text contract (one
    all-NULL chunk row, so corpus cardinality survives the fan-out).
    Row-for-row equality is pinned in tests/test_equivalence.py."""

    def eval(self, text, chunk_tokens: int, overlap_tokens: int):
        if text is None:
            yield None, None, None
            return
        toks = text.split(" ")
        stride = chunk_tokens - overlap_tokens
        last_start = max(len(toks) - (overlap_tokens + 1), 0)
        for s in range(0, last_start + 1, stride):
            chunk = " ".join(toks[s : s + chunk_tokens])
            yield s // stride, chunk, len(chunk.split(" "))


def chunk_documents_udtf(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """The SEVENTH Python-boundary kind: a Python UDTF (user-defined
    TABLE function, Spark 4) applied per input row via
    ``DataFrame.lateralJoin`` — the mechanism for one-row-in /
    N-rows-out logic that a scalar UDF cannot express and that
    ``explode`` can only express when the fan-out is an array
    expression.

    Same output schema and values as :func:`..text.chunk_documents`
    (``*other, chunk_id, chunk_text, n_tokens``); the higher-order
    JVM chunker remains the production path — this is the API-surface
    demo and the escape hatch for generators that genuinely need
    Python.

    Scale shape: the lateral UDTF evaluates inside the scan stage
    (Arrow-batched ``BatchEvalPythonUDTF``) — no shuffle, no driver
    involvement; the fan-out rides the existing partitioning exactly
    like ``explode``."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap_tokens}) must be < chunk ({chunk_tokens})"
        )
    other = [c for c in df.columns if c != text_col]
    return df.lateralJoin(
        ChunkUdtf(
            F.col(text_col).outer(),
            F.lit(chunk_tokens),
            F.lit(overlap_tokens),
        )
    ).select(*other, "chunk_id", "chunk_text", "n_tokens")
