"""Round-12 operator family: bloom semi-join reduction, blocked fuzzy
join, A-ES weighted sampling, CDC changelog apply.

Each test pins the property that makes the operator worth having at
100 TB — bloom: no false negatives and a bounded fp rate from a
fixed-size bitmap; fuzzy: blocked-equals-bruteforce within the block
semantics; weighted sample: the exact Efraimidis–Spirakis inclusion law,
replayable in pure Python; cdc: one aggregate, no window/sort in the
plan.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

import pytest
from pyspark.sql import functions as F

from parquet_to_postgres_spark.operators import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter,
    cdc_apply,
    fuzzy_join,
    fuzzy_pairs,
    weighted_priority,
    weighted_sample_topk,
)

from .conftest import SF_SMOKE


# ------------------------------------------------------------- bloom ----


def _bloom_fixture(spark):
    build = spark.range(0, 1000).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 100000).select(F.col("id").alias("fk"))
    return build, fact


def test_bloom_no_false_negatives(spark):
    build, fact = _bloom_fixture(spark)
    shed = bloom_prefilter(fact, "fk", build, "k", num_bits=1 << 16)
    true_members = fact.join(build, fact.fk == build.k, "left_semi")
    # every true member survives the bloom
    assert true_members.exceptAll(
        shed.join(build, shed.fk == build.k, "left_semi")
    ).count() == 0


def test_bloom_fp_rate_bounded(spark):
    build, fact = _bloom_fixture(spark)
    shed = bloom_prefilter(fact, "fk", build, "k", num_bits=1 << 16, num_hashes=5)
    n_pass = shed.count()
    n_true = fact.join(build, fact.fk == build.k, "left_semi").count()
    fp_rate = (n_pass - n_true) / (100000 - n_true)
    # theory ~2e-6 at m=2^16, n=1000, k=5; allow two orders of margin
    assert fp_rate < 1e-3, fp_rate


def test_bloom_empty_build_sheds_everything(spark):
    build, fact = _bloom_fixture(spark)
    shed = bloom_prefilter(fact, "fk", build.where("k < 0"), "k", num_bits=1 << 16)
    assert shed.count() == 0


def test_bloom_null_probe_keys_shed(spark):
    build, fact = _bloom_fixture(spark)
    nf = fact.withColumn("fk", F.when(F.col("fk") % 2 == 0, F.col("fk")))
    shed = bloom_prefilter(nf, "fk", build, "k", num_bits=1 << 16)
    assert shed.where(F.col("fk").isNull()).count() == 0


def test_bloom_build_bitmap_is_one_bounded_row(spark):
    build, _ = _bloom_fixture(spark)
    rows = bloom_build(build, "k", num_bits=1 << 16).collect()
    assert len(rows) == 1
    bitmap = rows[0]["bloom"]
    assert len(bitmap) <= (1 << 16) // 64  # words, not keys: size-bounded
    # at least one bit set per word present
    assert all(v != 0 for v in bitmap.values())


def test_bloom_might_contain_matches_python_replay(spark):
    """The k-probe expression against a hand-assembled bitmap agrees
    with a literal Python bloom over the same xxhash64 values."""
    build = spark.range(0, 50).select((F.col("id") * 3).alias("k"))
    probes = spark.range(0, 200).select(F.col("id").alias("fk"))
    m, k = 1 << 10, 3
    bitmap = bloom_build(build, "k", num_bits=m, num_hashes=k).collect()[0]["bloom"]
    # replay in python using spark's own xxhash64 outputs (over the
    # string-canonicalized key, matching _bloom_position)
    hashes = probes.select(
        "fk",
        *[
            F.xxhash64(F.col("fk").cast("string"), F.lit(i)).alias(f"h{i}")
            for i in range(k)
        ],
    ).collect()
    expected = {
        r["fk"]
        for r in hashes
        if all(
            (bitmap.get((r[f"h{i}"] % m) // 64, 0) >> ((r[f"h{i}"] % m) % 64)) & 1
            for i in range(k)
        )
    }
    got = {
        r["fk"]
        for r in probes.crossJoin(
            F.broadcast(bloom_build(build, "k", num_bits=m, num_hashes=k))
        )
        .where(bloom_might_contain("fk", "bloom", m, k))
        .collect()
    }
    assert got == expected


def test_bloom_validates_params(spark):
    build, _ = _bloom_fixture(spark)
    with pytest.raises(ValueError):
        bloom_build(build, "k", num_bits=100)  # not multiple of 64
    with pytest.raises(ValueError):
        bloom_build(build, "k", num_bits=1 << 31)  # past broadcast-sane cap
    with pytest.raises(ValueError):
        bloom_build(build, "k", num_hashes=0)


# ------------------------------------------------------------- fuzzy ----


def test_fuzzy_pairs_equals_bruteforce_within_blocks(spark):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").limit(200)
    got = {
        (r["a_c_custkey"], r["b_c_custkey"], r["edit_dist"])
        for r in fuzzy_pairs(
            cust, "c_custkey", "c_name", lambda c: F.substring(c, 1, 15), max_dist=1
        ).collect()
    }
    rows = [(r["c_custkey"], r["c_name"]) for r in cust.collect()]
    expected = set()
    for i, (ka, na) in enumerate(rows):
        for kb, nb in rows[i + 1 :]:
            a, b = (ka, na), (kb, nb)
            if a[0] > b[0]:
                a, b = b, a
            if a[1][:15] == b[1][:15]:
                d = _lev(a[1], b[1])
                if d <= 1:
                    expected.add((a[0], b[0], d))
    assert got == expected


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_rejects_colliding_column_names(spark):
    """Shared left/right names (or a dist_col collision) fail loudly —
    the post-join predicates would otherwise be AMBIGUOUS_REFERENCE or
    bind arbitrarily (ADVICE r12)."""
    left = spark.createDataFrame([(1, "abc")], "id int, t string")
    right = spark.createDataFrame([(2, "abd")], "id int, t2 string")
    with pytest.raises(ValueError, match="share column names"):
        fuzzy_join(
            left, right, "t", "t2",
            F.substring("t", 1, 2), F.substring("t2", 1, 2), max_dist=1,
        )
    right2 = spark.createDataFrame([(2, "abd", 0)], "id2 int, t2 string, edit_dist int")
    with pytest.raises(ValueError, match="dist_col"):
        fuzzy_join(
            left, right2, "t", "t2",
            F.substring("t", 1, 2), F.substring("t2", 1, 2), max_dist=1,
        )


def test_fuzzy_join_null_text_never_matches(spark):
    left = spark.createDataFrame([(1, "abc"), (2, None)], "id int, t string")
    right = spark.createDataFrame([(3, "abd"), (4, None)], "id2 int, t2 string")
    out = fuzzy_join(
        left,
        right,
        "t",
        "t2",
        F.substring("t", 1, 2),
        F.substring("t2", 1, 2),
        max_dist=1,
    )
    assert [(r["id"], r["id2"]) for r in out.collect()] == [(1, 3)]


def test_fuzzy_length_prefilter_keeps_all_true_pairs(spark):
    # strings whose length differs by exactly max_dist still match
    left = spark.createDataFrame([(1, "abcd")], "id int, t string")
    right = spark.createDataFrame([(2, "abcdxy")], "id2 int, t2 string")
    out = fuzzy_join(
        left, right, "t", "t2", F.substring("t", 1, 2), F.substring("t2", 1, 2), 2
    )
    assert out.count() == 1
    assert out.collect()[0]["edit_dist"] == 2


def test_fuzzy_rejects_negative_threshold(spark):
    df = spark.createDataFrame([(1, "a")], "id int, t string")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "t", "t", F.col("t"), F.col("t"), -1)


# --------------------------------------------------- weighted sample ----


def _py_priority(doc_id: int, w: float, salt: int) -> float:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:13]
    u = (int(h, 16) + 1) / (2**52 + 1)
    return -math.log(u) / w


def test_weighted_sample_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.collect() if r["n_chars"] > 0]
    for salt in (0, 7, 12345):
        expected = [
            d
            for d, _ in sorted(
                rows, key=lambda x: (_py_priority(x[0], x[1], salt), x[0])
            )[:20]
        ]
        got = [
            r["doc_id"]
            for r in weighted_sample_topk(docs, "doc_id", "n_chars", 20, salt)
            .select("doc_id")
            .collect()
        ]
        # top-k SET must match; Spark's limit does not promise order
        assert set(got) == set(expected), salt


def test_weighted_sample_k1_inclusion_law():
    """A-ES exactness at k=1: P(item selected) == w_i / Σw.  Pure-Python
    replay of the md5 priority over many salts — no Spark needed, the
    parity test above ties the engines together."""
    items = [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    total = sum(w for _, w in items)
    n = 4000
    wins = {i: 0 for i, _ in items}
    for salt in range(n):
        best = min(items, key=lambda x: _py_priority(x[0], x[1], salt))
        wins[best[0]] += 1
    for i, w in items:
        p = w / total
        se = math.sqrt(p * (1 - p) / n)
        assert abs(wins[i] / n - p) < 5 * se, (i, wins[i] / n, p)


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -5.0), (4, None), (None, 10.0)],
        "id long, w double",
    )
    got = weighted_sample_topk(df, "id", "w", 10).collect()
    assert [r["id"] for r in got] == [1]


def test_weighted_priority_rejects_bad_salt():
    with pytest.raises(ValueError):
        weighted_priority("id", "w", salt=-1)


# ----------------------------------------------------------------- cdc ----


def test_cdc_apply_upserts_and_tombstones(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "I", "a"),
            (1, 2, "U", "b"),  # live: latest non-delete
            (2, 1, "I", "x"),
            (2, 2, "D", None),  # tombstoned
            (3, 1, "D", None),
            (3, 2, "I", "re"),  # re-inserted after delete: live
        ],
        "k int, seq int, op string, v string",
    )
    got = {
        (r["k"], r["seq"], r["v"])
        for r in cdc_apply(log, ["k"], ["seq"], "op").collect()
    }
    assert got == {(1, 2, "b"), (3, 2, "re")}


def test_cdc_apply_plan_is_partial_aggregate_not_window(spark):
    log = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_totalprice",
    )
    out = cdc_apply(log, ["o_custkey"], ["o_orderdate", "o_orderkey"], "op")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # never the window idiom (full-history shuffle, no partial combine)
    assert "Window" not in plan
    # map-side partial combine present: the exchange carries one row
    # per (task, key), not the changelog history
    assert "partial_max" in plan


def test_cdc_apply_matches_window_formulation(spark):
    from pyspark.sql import Window

    log = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_totalprice",
    )
    got = cdc_apply(log, ["o_custkey"], ["o_orderdate", "o_orderkey"], "op")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ref = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .drop("rn", "op")
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0


# ---------------------------------------------- review-pass regressions ----


def test_bloom_key_width_mismatch_no_false_negatives(spark):
    """xxhash64 is type-sensitive (INT 5 != BIGINT 5); the string
    canonicalization in _bloom_position must make an int-typed probe
    match a bigint-typed build (a plain join would coerce and match)."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))  # bigint
    fact = spark.range(0, 100).select(F.col("id").cast("int").alias("fk"))
    shed = bloom_prefilter(fact, "fk", build, "k", num_bits=1 << 14)
    assert shed.count() == 100  # every true member survives


def test_bloom_prefilter_rejects_reserved_column(spark):
    build, fact = _bloom_fixture(spark)
    with pytest.raises(ValueError, match="__bloom_bits"):
        bloom_prefilter(
            fact.withColumn("__bloom_bits", F.lit(1)), "fk", build, "k"
        )


def test_fuzzy_join_rejects_reserved_block_column(spark):
    left = spark.createDataFrame([(1, "a")], "id int, t string")
    right = spark.createDataFrame([(2, "b")], "id2 int, t2 string")
    with pytest.raises(ValueError, match="__blk"):
        fuzzy_join(
            left.withColumn("__blk", F.lit("x")),
            right,
            "t",
            "t2",
            F.col("t"),
            F.col("t2"),
            1,
        )


def test_cdc_apply_null_op_is_not_a_tombstone(spark):
    log = spark.createDataFrame(
        [(1, 1, "I", "a"), (1, 2, None, "b")], "k int, seq int, op string, v string"
    )
    got = cdc_apply(log, ["k"], ["seq"], "op").collect()
    # the malformed NULL-op latest row stays live, never silently deleted
    assert [(r["k"], r["seq"], r["v"]) for r in got] == [(1, 2, "b")]


def test_weighted_sample_by_per_stratum_quota_and_replay(spark):
    """Each stratum keeps exactly min(k, |stratum|) rows, and the
    selected ids are the stratum-local A-ES winners — replayed with the
    same md5 priority in pure Python."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from parquet_to_postgres_spark.operators import weighted_sample_by

    got = weighted_sample_by(docs, "doc_id", "n_chars", "lang", k=7, salt=3)
    rows = [
        (r["doc_id"], r["n_chars"], r["lang"])
        for r in docs.collect()
        if r["n_chars"] > 0 and r["doc_id"] is not None
    ]
    expected = {}
    by_lang: dict = {}
    for d, w, lang in rows:
        by_lang.setdefault(lang, []).append((d, w))
    for lang, items in by_lang.items():
        winners = sorted(items, key=lambda x: (_py_priority(x[0], x[1], 3), x[0]))
        expected[lang] = {d for d, _ in winners[:7]}
    got_by = {}
    for r in got.collect():
        got_by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert got_by == expected


def test_weighted_sample_by_plan_group_limits_before_shuffle(spark):
    """The rank filter must plan as WindowGroupLimit (per-task pre-prune
    to k per stratum before the exchange) — the property that keeps the
    shuffle k·P-bounded per stratum at any population."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from parquet_to_postgres_spark.operators import weighted_sample_by

    out = weighted_sample_by(docs, "doc_id", "n_chars", "lang", k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    assert "WindowGroupLimit" in buf.getvalue()


# ------------------------------------------------------ skew diagnosis ----


def test_diagnose_skew_hitters_and_suggestion(spark):
    from parquet_to_postgres_spark.operators import diagnose_skew

    # 'hot' takes half the rows; NULL is its own skew class
    rows = [("hot",)] * 50 + [(None,)] * 20 + [(f"k{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "k string")
    hitters, summary, _ = diagnose_skew(df, ["k"], top_k=3)
    h = [(r["value"], r["n_rows"], r["rank"]) for r in hitters.orderBy("rank").collect()]
    assert h[0] == ("hot", 50, 1)
    assert h[1] == (None, 20, 2)
    assert len(h) == 3
    s = summary.collect()[0]
    assert s["n_rows"] == 100 and s["n_distinct"] == 32
    assert abs(s["max_frac"] - 0.5) < 1e-12
    # suggested = ceil(0.5 * shuffle_partitions)
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert s["suggested_buckets"] == -(-p // 2)


def test_diagnose_skew_uniform_suggests_one_bucket(spark):
    from parquet_to_postgres_spark.operators import diagnose_skew

    df = spark.range(1000).select(F.col("id").alias("k"))
    _, summary, _ = diagnose_skew(df, ["k"], top_k=2)
    s = summary.collect()[0]
    assert s["suggested_buckets"] == 1  # 1/1000 of the rows per key


def test_diagnose_skew_multi_column_and_validation(spark):
    from parquet_to_postgres_spark.operators import diagnose_skew

    df = spark.createDataFrame([(1, "a"), (1, "b")], "x long, y string")
    hitters, summary, _ = diagnose_skew(df, ["x", "y"], top_k=2)
    assert {r["column"] for r in summary.collect()} == {"x", "y"}
    assert hitters.where(F.col("column") == "x").collect()[0]["value"] == "1"
    with pytest.raises(ValueError):
        diagnose_skew(df, [], top_k=2)
    with pytest.raises(ValueError):
        diagnose_skew(df, ["x"], top_k=0)


def test_diagnose_skew_empty_input_and_plan_shape(spark):
    import contextlib
    import io

    from parquet_to_postgres_spark.operators import diagnose_skew

    empty = spark.createDataFrame([], "k string")
    hitters, summary, _ = diagnose_skew(empty, ["k"])
    assert hitters.count() == 0
    s = summary.collect()[0]
    assert (s["n_rows"], s["max_frac"], s["suggested_buckets"]) == (0, 0.0, 1)
    # per-column top-k must plan as WindowGroupLimit at the key grain,
    # never a global sort (the r13 single-pass reshape)
    df = spark.range(100).select(F.col("id").alias("k"))
    h, _, _ = diagnose_skew(df, ["k"], top_k=5, persist=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        h.explain(mode="simple")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan
    assert "GlobalLimit" not in plan and "Sort [n_rows" not in plan


def test_diagnose_skew_single_scan_for_all_columns(spark):
    """All requested columns ride ONE scan (the stacked explode); with
    persist on, the summary's plan reads the cached counts frame
    instead of recomputing the aggregate (VERDICT r12 item 5)."""
    import contextlib
    import io

    from parquet_to_postgres_spark.operators import diagnose_skew

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "b")], "x long, y string"
    )
    hitters, summary, _ = diagnose_skew(df, ["x", "y"], top_k=2, persist=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hitters.explain(mode="simple")
    # both columns ride ONE stacked (column, value)-grain aggregate —
    # not one aggregate per column unioned (the pre-r13 shape)
    assert "Union" not in buf.getvalue()

    hitters_p, summary_p, counts_p = diagnose_skew(df, ["x", "y"], top_k=2)
    try:
        hitters_p.collect()  # materializes the shared counts cache
        for frame in (hitters_p, summary_p):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                frame.explain(mode="simple")
            plan = buf.getvalue()
            # every consumer reads the cached counts frame (the
            # InMemoryRelation block re-prints its ORIGIN lineage, so
            # asserting the source scan's absence would be vacuous —
            # the cache hit is the InMemoryTableScan operator itself)
            assert "InMemoryTableScan" in plan
        # values unchanged vs the unpersisted lineage
        assert sorted(map(tuple, summary_p.collect())) == sorted(
            map(tuple, summary.collect())
        )
    finally:
        # the result carries the persisted frame so release is scoped,
        # not a cluster-wide clearCache
        counts_p.unpersist()


def test_diagnose_skew_rejects_duplicate_columns(spark):
    from parquet_to_postgres_spark.operators import diagnose_skew

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        diagnose_skew(df, ["x", "x"])
