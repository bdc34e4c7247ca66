"""Property-based tests (hypothesis) for the deterministic kernels.

Each Spark expression that feeds a signature/oracle is checked against a
plain-Python reference on generated inputs — the cross-engine analogue
of the DuckDB twin, with shrinking.  Example counts are small: every
example is a real Spark job.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

# r16 (VERDICT r15 item 6): hypothesis property tests (many examples x spark jobs) —
# excluded from the default (< 15 min) run; `pytest -m slow` runs it.
pytestmark = pytest.mark.slow

# printable ASCII minus the delimiters the operators treat specially
TEXT = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=0,
    max_size=40,
)
PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_ngrams(s: str, n: int) -> list[str]:
    if len(s) < n:
        return []
    seen, out = set(), []
    for i in range(len(s) - n + 1):
        g = s[i : i + n]
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@PROP
@given(st.lists(TEXT, min_size=1, max_size=8), st.integers(2, 5))
def test_char_ngrams_matches_python(spark, texts, n):
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.dedup import char_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["g"])
        for r in df.select("doc_id", char_ngrams("text", n).alias("g")).collect()
    }
    assert got == {i: _py_ngrams(t, n) for i, t in enumerate(texts)}


@PROP
@given(st.lists(TEXT.filter(lambda s: s != ""), min_size=1, max_size=8, unique=True))
def test_unit_id_matches_python_md5(spark, tokens):
    from parquet_to_postgres_spark.llm.dedup import unit_id

    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got = {r["token"]: r["uid"] for r in df.select("token", unit_id().alias("uid")).collect()}
    want = {
        t: int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in tokens
    }
    assert got == want


def _py_fingerprint(s: str, prefix: int = 64) -> int:
    h = 0
    for c in s[:prefix]:
        h = (h * 31 + ord(c)) % 1_000_000_007
    return h


@PROP
@given(st.lists(TEXT.filter(lambda s: s != ""), min_size=1, max_size=8))
def test_fingerprint_matches_python(spark, texts):
    from parquet_to_postgres_spark.llm.text import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", fingerprint().alias("fp")).collect()
    }
    assert got == {i: _py_fingerprint(t) for i, t in enumerate(texts)}


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    ),
)
def test_merge_upsert_matches_dict_reference(spark, base, upd):
    """merge_upsert == the obvious dict fold (insert each target row,
    then each update iff version >= current)."""
    from parquet_to_postgres_spark.etl import merge_upsert

    # one row per key on each side (dedup keep-max-version, like a real
    # snapshot + a compacted changelog); payload breaks exact ties
    def snapshot(rows):
        best = {}
        for k, ver, v in rows:
            if k not in best or (ver, v) > (best[k][0], best[k][1]):
                best[k] = (ver, v)
        return best

    t, u = snapshot(base), snapshot(upd)
    want = dict(t)
    for k, (ver, v) in u.items():
        if k not in want or ver >= want[k][0]:
            want[k] = (ver, v)

    target = spark.createDataFrame(
        [(k, ver, v) for k, (ver, v) in t.items()], "k long, ver long, v long"
    )
    updates = spark.createDataFrame(
        [(k, ver, v) for k, (ver, v) in u.items()], "k long, ver long, v long"
    )
    got = {
        r["k"]: (r["ver"], r["v"])
        for r in merge_upsert(target, updates, keys=["k"], version_col="ver").collect()
    }
    assert got == want


def test_tf_idf_matches_python_reference(spark):
    """TF-IDF scores == a plain-Python computation (smoothed idf),
    within float tolerance; top_k keeps the k best per doc."""
    import math

    from parquet_to_postgres_spark.llm.text import tf_idf

    corpus = {
        1: "a b b c",
        2: "a a d",
        3: "c c c e b",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    n = len(corpus)
    docfreq = {}
    for text in corpus.values():
        for t in set(text.split()):
            docfreq[t] = docfreq.get(t, 0) + 1
    want = {}
    for d, text in corpus.items():
        toks = text.split()
        for t in set(toks):
            tf = toks.count(t) / len(toks)
            want[(d, t)] = tf * (math.log((n + 1) / (docfreq[t] + 1)) + 1)

    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tf_idf(df).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])

    top1 = {
        r["doc_id"]: r["term"] for r in tf_idf(df, top_k=1).collect()
    }
    ref_top1 = {}
    for d in corpus:
        best = max(
            ((t, s) for (dd, t), s in want.items() if dd == d),
            key=lambda kv: (kv[1], [chr(255 - ord(c)) for c in kv[0]]),
        )
        ref_top1[d] = best[0]
    assert top1 == ref_top1


@PROP
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.floats(min_value=0.05, max_value=1.0),
        min_size=1,
        max_size=4,
    ),
    st.integers(0, 3),
)
def test_sample_to_mixture_invariants(spark, weights, seed_shift):
    """For ANY weight map: output ⊆ input, unlisted strata absent, at
    least one stratum kept entirely-or-downsampled at the binding ratio,
    and the selection is deterministic."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import sample_to_mixture

    rows = [(i + seed_shift, "abcd"[i % 4]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = sample_to_mixture(df, "id", "k", weights)
    got = {
        r["k"]: r["n"]
        for r in out.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) <= set(weights)
    orig = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(got[k] <= orig[k] for k in got)  # downsample-only
    # deterministic
    again = sample_to_mixture(df, "id", "k", weights)
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


@PROP
@given(st.integers(2, 12), st.sampled_from(["inner", "left"]))
def test_salted_join_property(spark, buckets, how):
    """salted_join ≡ plain join for any bucket count, join type, and
    salt sign: F.hash() is the natural salt choice and is frequently
    NEGATIVE — pmod reduction must land it in a replicated bucket (a
    sign-preserving % would silently drop those rows from inner joins)."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import salted_join

    big = spark.createDataFrame(
        [(i, i % 5) for i in range(300)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 5, 2)], "k long, payload string"
    )
    plain = big.join(dim, ["k"], how)
    for salt in (F.col("row_id"), F.hash(F.col("row_id"))):
        fast = salted_join(
            big, dim, ["k"], salt_col=salt, buckets=buckets, how=how
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, plain.collect())
        )
    # explicitly all-negative salt: every row must still join
    neg = salted_join(
        big, dim, ["k"],
        salt_col=(-F.col("row_id") - 1), buckets=buckets, how=how,
    )
    assert sorted(map(tuple, neg.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_time_rollup_one_pass_matches_per_grain_aggs(spark):
    """The multi-grain rollup equals independent per-grain aggregations,
    and its plan is ONE scan + one Expand feeding one aggregate (the
    grouping-sets contract), not a job per grain."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import time_rollup
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
    ]
    rolled = time_rollup(
        ev, "ts", aggs, grains=("hour", "day"), keys=("event_type",)
    )
    got = {
        (r["grain"], r["bucket_ts"], r["event_type"]): (r["n"], r["total"])
        for r in rolled.collect()
    }
    for grain in ("hour", "day"):
        expect = (
            ev.groupBy(
                F.date_trunc(grain, "ts").alias("b"), "event_type"
            ).agg(*aggs)
        ).collect()
        assert len([k for k in got if k[0] == grain]) == len(expect)
        for r in expect:
            assert got[(grain, r["b"], r["event_type"])] == (
                r["n"], r["total"],
            ), (grain, r["b"])
    # single-pass plan: one parquet scan, one Expand (explain a FRESH
    # frame — the executed one would print AQE initial+final sections
    # and double-count nodes)
    import io
    import re
    import contextlib

    fresh = time_rollup(
        ev, "ts", aggs, grains=("hour", "day"), keys=("event_type",)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh.explain(mode="formatted")
    p = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Expand", p, re.M)) == 1


def test_time_rollup_rejects_unknown_grain(spark):
    import pytest
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import time_rollup
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="unknown grains"):
        time_rollup(ev, "ts", [F.count(F.lit(1)).alias("n")], grains=("decade",))


@given(
    n_tokens=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
@PROP
def test_chunking_reconstructs_the_document(spark, n_tokens, chunk, overlap):
    """Lossless-chunking property: dropping each non-first chunk's
    leading `overlap` tokens and concatenating reconstructs the exact
    original token sequence — no token lost, duplicated, or reordered,
    for ANY (length, chunk, overlap) combination."""
    from hypothesis import assume
    from pyspark.sql import functions as F  # noqa: F401

    from parquet_to_postgres_spark.llm.text import chunk_documents

    assume(overlap < chunk)
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap_tokens=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    stride = chunk - overlap
    rebuilt: list[str] = []
    for i, r in enumerate(out):
        assert r["chunk_id"] == i
        ctoks = r["chunk_text"].split(" ")
        assert len(ctoks) <= chunk
        rebuilt.extend(ctoks if i == 0 else ctoks[overlap:])
    assert rebuilt == toks
    # starts advance by exactly stride: chunk i covers tokens from i*stride
    for i, r in enumerate(out):
        assert r["chunk_text"].split(" ")[0] == toks[i * stride]


@PROP
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    st.integers(2, 3),
)
def test_span_dedup_matches_duckdb_on_random_corpora(spark, texts, n):
    """Cross-engine property: over adversarial corpora (4-token vocab ->
    dense overlapping repeats, empty docs, dup docs) the repeated-span
    dedup must equal its DuckDB twin exactly — pinning gram ranking,
    coverage of overlapping removed spans, and the all-removed ->
    empty-string rebuild on inputs far nastier than the fixtures."""
    import duckdb
    import pandas as pd

    from parquet_to_postgres_spark.llm.dedup import (
        dedup_repeated_spans,
        sql_dedup_repeated_spans,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_repeated_spans(df, n=n).collect()
    }
    con = duckdb.connect()
    con.register("corpus_prop", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(i): t
        for i, t in con.sql(
            sql_dedup_repeated_spans("corpus_prop", n=n)
        ).fetchall()
    }
    con.close()
    assert got == want


@PROP
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([0.01, 0.05, 0.2]),
    st.integers(1, 5),
)
def test_qsketch_guarantee_and_merge_invariance(spark, vals, alpha, parts):
    """Property: for ANY value list, alpha, and partitioning, every
    decoded quantile is within alpha relative error of the exact value
    at its rank, and splitting the list into two rollups then merging
    is bit-identical to the direct build."""
    import math

    from parquet_to_postgres_spark.operators import (
        qsketch_merge,
        qsketch_quantiles,
        qsketch_rollup,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double"
    ).repartition(parts)
    qs = [0.0, 0.5, 1.0]
    got = qsketch_quantiles(
        qsketch_rollup(df, ["k"], "v", alpha=alpha), qs
    ).collect()[0]
    s = sorted(vals)
    n = len(s)
    for q, col in [(0.0, "p0"), (0.5, "p50"), (1.0, "p100")]:
        exact = s[math.ceil(q * (n - 1))]
        assert abs(got[col] - exact) <= alpha * abs(exact) + 1e-9, (
            q, got[col], exact, alpha,
        )

    # split → rollup each → merge == direct build, entry-for-entry
    half = len(vals) // 2
    a = spark.createDataFrame(
        [("g", float(v)) for v in vals[:half]] or [("zz", 0.0)],
        "k string, v double",
    )
    b = spark.createDataFrame(
        [("g", float(v)) for v in vals[half:]], "k string, v double"
    )
    merged = qsketch_merge(
        qsketch_rollup(a, ["k"], "v", alpha=alpha).unionByName(
            qsketch_rollup(b, ["k"], "v", alpha=alpha)
        ),
        ["k"],
    )
    direct = qsketch_rollup(df, ["k"], "v", alpha=alpha)

    def canon(frame):
        return sorted(
            (r["k"], r["n_values"], r["alpha"], tuple(map(tuple, r["entries"])))
            for r in frame.collect()
            if r["k"] == "g"
        )

    assert canon(merged) == canon(direct)


@PROP
@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=80),
    st.integers(1, 6),
    st.integers(1, 5),
)
def test_frequent_items_bounds_hold_for_any_input(spark, vals, k, parts):
    """Property: for ANY multiset, k, and partitioning, every returned
    candidate's bounds bracket its true count and every item above the
    n/(k+1) coverage threshold is present."""
    from parquet_to_postgres_spark.operators import frequent_items

    df = spark.createDataFrame(
        [(str(v),) for v in vals], "v string"
    ).repartition(parts)
    got = {
        r["item"]: (r["est_count"], r["max_count"])
        for r in frequent_items(df, "v", k=k).collect()
    }
    exact: dict = {}
    for v in vals:
        exact[str(v)] = exact.get(str(v), 0) + 1
    assert len(got) <= k
    for item, (est, mx) in got.items():
        assert est <= exact[item] <= mx, (item, est, mx, k, parts)
    n = len(vals)
    for item, c in exact.items():
        if c > n / (k + 1):
            assert item in got, (item, c, k, parts)


@PROP
@given(
    st.lists(
        st.integers(0, 120), min_size=1, max_size=80
    ),
    st.lists(
        st.integers(60, 200), min_size=1, max_size=80
    ),
    st.sampled_from([2, 8, 64]),
    st.integers(1, 4),
)
def test_kmv_properties(spark, a_members, b_members, k, parts):
    """Property, for ANY two member multisets, k, and partitioning:
    (1) splitting A into two rollups then kmv_merge-ing is
    hash-for-hash identical to the direct build (the sketch is a
    deterministic function of the distinct-member set); (2) estimates
    are exact whenever the sample is exhaustive; (3) set-operation
    outputs are exact whenever |A∪B| < k; (4) est_count ≤ k always."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import (
        kmv_estimate,
        kmv_merge,
        kmv_rollup,
        kmv_set_cardinalities,
    )

    mk = lambda ms: spark.createDataFrame(  # noqa: E731
        [("g", str(m)) for m in ms], "g string, m string"
    ).repartition(parts)
    ra = kmv_rollup(mk(a_members), ["g"], "m", k=k)
    rb = kmv_rollup(mk(b_members), ["g"], "m", k=k)

    # (1) split-merge == direct (split A at an arbitrary point)
    cut = len(a_members) // 2
    if cut and cut < len(a_members):
        split = kmv_merge(
            kmv_rollup(mk(a_members[:cut]), ["g"], "m", k=k).unionByName(
                kmv_rollup(mk(a_members[cut:]), ["g"], "m", k=k)
            ),
            ["g"],
        ).collect()[0]
        direct = ra.collect()[0]
        assert list(split["hashes"]) == list(direct["hashes"])
        assert split["n_rows"] == direct["n_rows"] == len(a_members)

    # (2) exhaustive-sample exactness; (4) bounded sample
    for roll, ms in ((ra, a_members), (rb, b_members)):
        row = kmv_estimate(roll).collect()[0]
        n_dist = len(set(ms))
        assert len(row["hashes"]) == min(n_dist, k)
        if n_dist < k:
            assert row["n_distinct_approx"] == n_dist

    # (3) set-op exactness below union saturation
    sa, sb = set(a_members), set(b_members)
    if len(sa | sb) < k:
        got = kmv_set_cardinalities(ra, rb, ["g"]).collect()[0]
        assert got["n_left"] == len(sa)
        assert got["n_right"] == len(sb)
        assert got["n_union"] == len(sa | sb)
        assert got["n_intersection"] == len(sa & sb)
