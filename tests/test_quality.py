"""Data-quality validation gate: planted violations are counted exactly,
row-local rules share one aggregate pass."""

from __future__ import annotations

from pyspark.sql import Row

from parquet_to_postgres_spark.quality import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
    validate,
)

from .conftest import SF_SMOKE


def _dirty(spark):
    rows = [
        Row(id=1, status="A", price=10.0, code="X1"),
        Row(id=2, status="B", price=-5.0, code="X2"),    # price out of range
        Row(id=2, status="A", price=20.0, code="X3"),    # duplicate id
        Row(id=3, status="Z", price=30.0, code="bad"),   # bad status + code
        Row(id=4, status=None, price=None, code="X4"),   # nulls
        Row(id=5, status="A", price=40.0, code="X5"),
    ]
    return spark.createDataFrame(rows)


def test_validate_counts_planted_violations(spark):
    df = _dirty(spark)
    rules = (
        not_null("status", "price")
        + [
            in_range("price", 0, 100),
            in_set("status", ("A", "B")),
            matches("code", r"^X\d$"),
            unique("id"),
        ]
    )
    got = {r["rule"]: (r["n_violations"], r["passed"]) for r in validate(df, rules).collect()}
    assert got == {
        "not_null(status)": (1, False),
        "not_null(price)": (1, False),
        "in_range(price,0,100)": (1, False),
        "in_set(status)": (1, False),
        "matches(code)": (1, False),
        "unique(id)": (1, False),
    }


def test_validate_clean_table_passes(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    rules = not_null("o_orderkey", "o_custkey") + [
        unique("o_orderkey"),
        in_set("o_orderstatus", ("F", "O", "P")),
        foreign_key(("o_custkey",), customer, ("c_custkey",)),
    ]
    out = validate(orders, rules).collect()
    assert len(out) == 5
    assert all(r["passed"] for r in out), [
        (r["rule"], r["n_violations"]) for r in out if not r["passed"]
    ]


def test_validate_foreign_key_orphans_and_null_keys(spark):
    fact = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=99), Row(k=None)]
    )
    dim = spark.createDataFrame([Row(dk=1), Row(dk=2)])
    out = validate(fact, [foreign_key(("k",), dim, ("dk",))]).collect()[0]
    # 99 is an orphan; the NULL key row is NOT a violation (SQL semantics)
    assert out["n_violations"] == 1 and not out["passed"]


def test_validate_rowwise_rules_share_one_pass(spark):
    """Plan evidence: N row-local rules must produce exactly one
    aggregate over the table (one scan), not one job per rule."""
    df = _dirty(spark)
    rules = not_null("status", "price") + [
        in_range("price", 0, 100),
        in_set("status", ("A", "B")),
    ]
    res = validate(df, rules)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final, one agg pair (+generate)


def test_validate_empty_rules_returns_empty_frame(spark):
    """Config-driven gates may generate zero rules; that's an empty
    result, not an IndexError."""
    df = _dirty(spark)
    out = validate(df, [])
    assert out.columns == ["rule", "n_violations", "passed"]
    assert out.count() == 0


def test_profile_drift_flags_moved_columns(spark):
    """Drift diff of two single-pass profiles: stable columns pass,
    a null-spiked column and a scaled numeric column are flagged, and
    added/removed columns surface by status."""
    from parquet_to_postgres_spark.operators import profile_columns
    from parquet_to_postgres_spark.quality import profile_drift

    base_df = spark.range(1000).selectExpr(
        "id", "cast(id % 7 as double) as v", "concat('u', id % 50) as cat"
    )
    # drifted batch: v scaled 10x, cat mostly null, id untouched, new col
    cur_df = spark.range(1000).selectExpr(
        "id",
        "cast((id % 7) * 10 as double) as v",
        "if(id % 4 = 0, concat('u', id % 50), null) as cat",
        "cast(1 as int) as extra",
    )
    drift = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(base_df), profile_columns(cur_df)
        ).collect()
    }
    assert drift["id"]["status"] == "common" and not drift["id"]["drifted"]
    assert drift["v"]["drifted"]  # mean moved 10x
    assert drift["cat"]["drifted"]  # null ratio spiked
    assert drift["extra"]["status"] == "added" and drift["extra"]["drifted"]


def test_profile_drift_empty_input_profile(spark):
    """Column presence must come from explicit markers, not derived
    metrics: a profile taken over an EMPTY batch has n_rows=0 and NULL
    null-ratios, but its columns are still present — they must read as
    'common', never 'added'/'removed'."""
    from parquet_to_postgres_spark.operators import profile_columns
    from parquet_to_postgres_spark.quality import profile_drift

    base_df = spark.range(100).selectExpr(
        "id", "cast(id % 3 as double) as v"
    )
    empty_df = base_df.where("id < 0")  # same schema, zero rows
    drift = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(base_df), profile_columns(empty_df)
        ).collect()
    }
    assert set(drift) == {"id", "v"}
    for col in ("id", "v"):
        assert drift[col]["status"] == "common", drift[col]
    # and symmetric: empty baseline, populated current
    drift2 = {
        r["column"]: r
        for r in profile_drift(
            profile_columns(empty_df), profile_columns(base_df)
        ).collect()
    }
    for col in ("id", "v"):
        assert drift2[col]["status"] == "common", drift2[col]


def test_chunk_documents_overlap_and_coverage(spark):
    """Chunking must cover every token (no tail loss), overlap adjacent
    chunks by exactly `overlap`, and keep provenance columns."""
    from parquet_to_postgres_spark.llm.text import chunk_documents

    rows = [
        (1, "en", " ".join(f"t{i}" for i in range(10))),  # 10 tokens
        (2, "de", "only three tokens"),                    # shorter than chunk
        (3, "fr", " ".join(f"u{i}" for i in range(7))),    # exactly chunk+stride
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6 (stride 3); last start < 10-1
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"].split() for r in c1] == [
        ["t0", "t1", "t2", "t3"],
        ["t3", "t4", "t5", "t6"],
        ["t6", "t7", "t8", "t9"],
    ]
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"].split()[-1:] == b["chunk_text"].split()[:1]
    # every source token appears in some chunk
    assert set().union(*[set(r["chunk_text"].split()) for r in c1]) == {
        f"t{i}" for i in range(10)
    }
    # short doc: single whole chunk, provenance kept
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["chunk_text"] == "only three tokens"
    assert by_doc[2][0]["lang"] == "de"
    assert by_doc[2][0]["n_tokens"] == 3
    # 7 tokens: starts 0,3 only — a start at 6 would carry no NEW
    # token (u6 is already chunk 1's tail), and coverage is total:
    # last_start >= n - chunk always, so the final window reaches n
    c3 = sorted(by_doc[3], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c3] == [4, 4]
    assert set().union(*[set(r["chunk_text"].split()) for r in c3]) == {
        f"u{i}" for i in range(7)
    }


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from parquet_to_postgres_spark.llm.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_shuffle_deterministic_is_a_stable_permutation(spark):
    """Same rows, new order; identical across runs; different salts give
    different permutations; plan is a range-partitioned sort (no single
    partition funnel)."""
    from parquet_to_postgres_spark.llm.text import shuffle_deterministic
    from parquet_to_postgres_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    p0 = [r["doc_id"] for r in shuffle_deterministic(docs, "doc_id").collect()]
    p0_again = [
        r["doc_id"] for r in shuffle_deterministic(docs, "doc_id").collect()
    ]
    p1 = [
        r["doc_id"]
        for r in shuffle_deterministic(docs, "doc_id", salt=1).collect()
    ]
    assert p0 == p0_again  # reproducible
    assert sorted(p0) == sorted(p1)  # a permutation
    assert p0 != p1  # salt decorrelates
    assert p0 != sorted(p0)  # actually shuffled
    plan = shuffle_deterministic(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan and "rangepartitioning" in plan.lower()


def test_repetition_features_known_values(spark):
    """Gopher-rule repetition signals against hand-computed values."""
    from parquet_to_postgres_spark.llm.text import repetition_features

    rows = [
        # 3 lines, one duplicated; 6 words, 'spam' x4; top bigram
        # 'spam spam' appears 2 of 5 bigrams
        (1, "spam spam\nspam spam\nbuy now"),
        (2, "all words unique here"),          # no repetition at all
        (3, None),                              # null -> null features
        (4, "x x x x"),                         # degenerate repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *repetition_features()).collect()
    }
    r1 = out[1]
    assert abs(r1["dup_line_frac"] - (1 - 2 / 3)) < 1e-12
    # tokens: spam spam\nspam(counts as one token 'spam\nspam'? no —
    # split on ' ' keeps the newline inside a token) — verify via the
    # unique-doc instead; r1 token math intentionally unasserted here
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_2gram_share"] == 1 / 3  # 3 distinct bigrams, each once
    assert out[3]["dup_line_frac"] is None
    assert out[3]["dup_word_frac"] is None
    r4 = out[4]
    assert abs(r4["dup_word_frac"] - 0.75) < 1e-12   # 4 'x', 1 distinct
    assert r4["top_2gram_share"] == 1.0              # all bigrams 'x x'


def test_assign_splits_disjoint_covering_stable(spark):
    """Splits are disjoint+covering by construction, deterministic,
    roughly proportional, and STABLE: a row keeps its split when other
    rows are added or removed (the anti-contamination property)."""
    import pytest
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.operators import assign_splits

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, "doc_id", fr)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == set(fr)            # covering, all labels present
    assert sum(counts.values()) == 2000      # disjoint (each row once)
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert counts["val"] / 2000 < 0.15 and counts["test"] / 2000 < 0.15

    # stability: the same doc_id gets the same split in a different corpus
    sub = assign_splits(
        df.where(F.col("doc_id") % 3 == 0), "doc_id", fr
    ).collect()
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)

    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "doc_id", {"train": 0.5, "test": 0.4})


def test_salted_hash_ops_reject_out_of_range_salt(spark):
    """Negative salt would ride Spark's sign-following % into a negative
    bucket (all rows below every threshold); over-wide salt could
    overflow int64.  Both are rejected up front, and the pmod path keeps
    valid salts well-distributed."""
    import pytest
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.text import shuffle_deterministic
    from parquet_to_postgres_spark.operators import assign_splits

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    for bad in (-1, 2**31):
        with pytest.raises(ValueError, match="salt"):
            assign_splits(df, "doc_id", fr, salt=bad)
        with pytest.raises(ValueError, match="salt"):
            shuffle_deterministic(df, "doc_id", salt=bad)

    # max valid salt still yields all three labels (no collapse)
    out = assign_splits(df, "doc_id", fr, salt=2**31 - 1)
    labels = {
        r["split"]
        for r in out.select("split").distinct().collect()
    }
    assert labels == set(fr)


def test_salted_hash_ops_no_overflow_at_extremes(spark):
    """Regression (round-7 ADVICE): ids whose mod-2^31 hash is near
    2^31-1 combined with the max valid salt used to overflow int64 in
    the Knuth multiply ((2^31-1 + 2^31-1) * 2654435761 > 2^63), which
    throws ARITHMETIC_OVERFLOW under Spark 4.x's default ANSI mode.
    The salted sum is now reduced mod 2^31 before the multiply, so the
    extreme corner must EXECUTE (not just parse) for every salted op."""
    from parquet_to_postgres_spark.llm.text import shuffle_deterministic
    from parquet_to_postgres_spark.operators import assign_splits, hash_sample

    # ids straddling 2^31 so pmod(id, 2^31) hits both ~0 and ~2^31-1,
    # plus a 64-bit id to exercise the outer reduction.
    ids = [2**31 - 1, 2**31 - 2, 2**31, 2**31 + 1, 0, 1, 2**40 + 2**31 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    max_salt = 2**31 - 1

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    split_rows = assign_splits(df, "doc_id", fr, salt=max_salt).collect()
    assert len(split_rows) == len(ids)
    assert all(r["split"] in fr for r in split_rows)

    perm = [r["doc_id"] for r in shuffle_deterministic(df, "doc_id", salt=max_salt).collect()]
    assert sorted(perm) == sorted(ids)

    # hash_sample at fraction=1.0 must keep everything (bucket < 2^32
    # always) — and must not throw on the way there.
    kept = hash_sample(df, "doc_id", 1.0, salt=max_salt).collect()
    assert len(kept) == len(ids)
    import pytest

    with pytest.raises(ValueError, match="salt"):
        hash_sample(df, "doc_id", 0.5, salt=2**31)


def test_decontaminate_literal_semantics(spark):
    """Known micro-case: doc 1 shares a 3-gram with the eval set, doc 2
    shares only shorter overlaps, doc 3 is too short to produce any
    3-gram (the size>=n guard must yield empty, not count-down grams)."""
    from parquet_to_postgres_spark.llm.text import (
        contaminated_ids,
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown wolf runs fast"),
            (3, "br own"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [("what does the quick brown fox do",)], "text string"
    )

    hits = sorted(
        r["doc_id"] for r in contaminated_ids(corpus, eval_df, n=3).collect()
    )
    assert hits == [1]

    clean = sorted(
        r["doc_id"] for r in decontaminate(corpus, eval_df, n=3).collect()
    )
    assert clean == [2, 3]

    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, eval_df, n=3, mode="flag").collect()
    }
    assert flags == {1: True, 2: False, 3: False}


def test_decontaminate_matches_duckdb_oracle(spark, duck):
    """Corpus-scale twin check: the eval set is derived from the
    documents table itself (first 8 words of every 7th doc), built with
    the SAME expressions in both engines, and the contaminated-id sets
    must agree exactly."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.text import (
        contaminated_ids,
        sql_word_ngram_ids,
    )
    from parquet_to_postgres_spark.tables import Catalog

    n = 8
    docs = Catalog(spark, SF_SMOKE).documents
    eval_df = docs.where(F.col("doc_id") % 7 == 0).select(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, n)).alias(
            "text"
        )
    )
    got = sorted(
        r["doc_id"] for r in contaminated_ids(docs, eval_df, n=n).collect()
    )

    eval_sql = (
        "(SELECT array_to_string(string_split(text, ' ')[1:8], ' ') AS text "
        "FROM documents WHERE doc_id % 7 = 0)"
    )
    want = sorted(
        r[0]
        for r in duck.sql(
            f"SELECT DISTINCT c.doc_id FROM ({sql_word_ngram_ids('documents', n)}) c "
            f"JOIN ({sql_word_ngram_ids(eval_sql, n, id_expr='1')}) e USING (__g)"
        ).fetchall()
    )
    assert got == want and len(got) > 0


# --------------------------------------------------- char n-gram LM ----


def test_char_lm_literal_probabilities(spark):
    """Hand-computed micro-case: corpus 'abab', n=2.  Bigrams ab,ba,ab →
    counts (a→b)=2, (b→a)=1; totals a=2, b=1; V=2.  Scoring 'ab' with
    alpha=0.5: logp = ln(2.5/3), bpc = -logp/ln 2.  Unseen context 'zz'
    scores the uniform floor ln(0.5/1.0) per gram."""
    import math

    from parquet_to_postgres_spark.llm.text import (
        score_char_lm,
        train_char_lm,
    )

    corpus = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    lm, v = train_char_lm(corpus, n=2)
    assert v == 2
    rows = {(r["ctx"], r["ch"]): (r["c"], r["ctx_total"]) for r in lm.collect()}
    assert rows == {("a", "b"): (2, 2), ("b", "a"): (1, 1)}

    docs = spark.createDataFrame(
        [(10, "ab"), (11, "zz"), (12, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in score_char_lm(docs, lm, v, n=2).collect()}
    assert got[10]["n_grams"] == 1
    assert abs(got[10]["bpc"] - (-math.log(2.5 / 3.0) / math.log(2))) < 1e-6
    # unseen ctx: c=0, total=0 → ln(0.5 / (0 + 0.5*2)) = ln(0.5)  → 1 bit
    assert abs(got[11]["bpc"] - 1.0) < 1e-6
    assert got[12]["n_grams"] == 0 and got[12]["bpc"] is None


def test_char_lm_separates_fluent_from_noise(spark):
    """The quality signal: under a model trained on the real documents
    table, natural-looking text scores fewer bits/char than
    high-entropy gibberish."""
    from parquet_to_postgres_spark.llm.text import (
        score_char_lm,
        train_char_lm,
    )
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents
    lm, v = train_char_lm(docs, n=3)
    lm = lm.localCheckpoint(eager=True)
    probe = spark.createDataFrame(
        [
            (1, "spark merge join table scan window batch stream filter"),
            (2, "qzxjv kwpf gqq zzxw vjkq pzxq wqjz xkvz qqpw zjxk vqzw"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bpc"] for r in score_char_lm(probe, lm, v).collect()}
    assert got[1] < got[2], got


def test_char_lm_matches_duckdb_oracle(spark, duck):
    """Train-on-documents / score-documents bpc agrees with the DuckDB
    twin per doc to 1e-9 (fixed-point means are order-independent; the
    residual is the engines' last-ulp ln difference)."""
    from parquet_to_postgres_spark.llm.text import (
        score_char_lm,
        sql_char_lm_bpc,
        train_char_lm,
    )
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents
    lm, v = train_char_lm(docs, n=3)
    got = {
        r["doc_id"]: (r["n_grams"], r["bpc"])
        for r in score_char_lm(docs, lm, v, n=3).collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in duck.sql(sql_char_lm_bpc("documents", n=3)).fetchall()
    }
    assert set(want) <= set(got) and len(want) > 400
    for did, (ng, bpc) in want.items():
        g_ng, g_bpc = got[did]
        assert g_ng == ng, (did, g_ng, ng)
        assert abs(g_bpc - bpc) < 1e-9, (did, g_bpc, bpc)


def test_strip_markup_literal_and_twin(spark, duck):
    from parquet_to_postgres_spark.llm.text import (
        sql_strip_markup,
        strip_markup,
    )

    rows = [
        (1, "<p>Hello <b>world</b></p>"),
        (2, "a<br>b<script>var x = '<p>';</script>c"),
        (3, "<style type='text/css'>p {color: red}</style>text"),
        (4, "5 &lt; 6 &amp;&amp; 7 &gt; 2, &amp;lt; stays"),
        (5, "<!-- secret --><DIV CLASS='x'>shout</DIV>"),
        (6, None),
        (7, "no markup at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", strip_markup("text").alias("t")).collect()
    }
    assert got[1] == "Hello world"
    assert got[2] == "a b c"  # script content dies, tag keeps boundary
    assert got[3] == "text"
    assert got[4] == '5 < 6 && 7 > 2, &lt; stays'  # single decode pass
    assert got[5] == "shout"  # comment + uppercase tags
    assert got[6] is None
    assert got[7] == "no markup at all"
    # DuckDB twin parity on the same rows
    duck.register(
        "markup_rows",
        __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]),
    )
    want = {
        int(i): t
        for i, t in duck.sql(
            f"SELECT doc_id, {sql_strip_markup()} AS t FROM markup_rows"
        ).fetchall()
    }
    assert got == want


def test_profile_columns_handles_exotic_column_names(spark):
    """Review finding: generated stack/alias SQL broke on any column
    that is not a bare identifier — exactly the names external tables
    arrive with."""
    from parquet_to_postgres_spark.operators import profile_columns

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y")],
        ["user id", "price-usd", "it's"],
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(prof) == {"user id", "price-usd", "it's"}
    assert prof["user id"]["n_non_null"] == 2
    assert prof["price-usd"]["n_null"] == 1
    assert prof["price-usd"]["mean"] == 2.5


def test_profile_columns_minmax_optout(spark):
    """r15 optimization: ``minmax=False`` must keep the schema and every
    non-minmax metric bit-identical while emitting NULL min/max — and
    must restore the HashAggregate plan (string-typed min/max buffers
    are what force the profiler into SortAggregate; the stack() unpivot
    blocks Catalyst from pruning them when a consumer drops the
    columns)."""
    from parquet_to_postgres_spark.operators import profile_columns

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (2, 7.0, None)],
        "id long, price double, label string",
    )
    full = profile_columns(df, exact_distinct=True, decimal_mean=True)
    slim = profile_columns(
        df, exact_distinct=True, decimal_mean=True, minmax=False
    )
    assert full.schema == slim.schema
    keep = ["column", "n_rows", "n_non_null", "n_null", "approx_distinct", "mean"]
    fr = {r["column"]: r for r in full.collect()}
    sr = {r["column"]: r for r in slim.collect()}
    assert set(fr) == set(sr) == {"id", "price", "label"}
    for c in fr:
        assert [fr[c][k] for k in keep] == [sr[c][k] for k in keep]
        assert sr[c]["min_value"] is None and sr[c]["max_value"] is None
        assert fr[c]["min_value"] is not None
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        slim.explain(mode="formatted")
    slim_plan = buf.getvalue()
    assert "SortAggregate" not in slim_plan
    assert "HashAggregate" in slim_plan


def test_validate_expectations_split_and_report(spark):
    """The gate splits rows exactly, annotates quarantined rows with
    every violated rule, fails CLOSED on NULLs in guarded columns, and
    the report counts match the split."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.quality import validate_expectations

    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),      # range violation
            (3, None, "ok"),      # NULL in guarded column -> fail closed
            (4, 20.0, None),      # missing label
            (5, -1.0, None),      # both
        ],
        "id long, amount double, label string",
    )
    clean, quarantined, report = validate_expectations(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "label_present": F.col("label").isNotNull(),
        },
    )
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1]
    q = {r["id"]: sorted(r["violations"]) for r in quarantined.collect()}
    assert q == {
        2: ["amount_positive"],
        3: ["amount_positive"],
        4: ["label_present"],
        5: ["amount_positive", "label_present"],
    }
    rep = {r["rule"]: r["n_violations"] for r in report.collect()}
    assert rep == {"amount_positive": 3, "label_present": 2}
    fr = {r["rule"]: r["frac_violations"] for r in report.collect()}
    assert fr["amount_positive"] == 3 / 5


def test_validate_expectations_rejects_empty_rules(spark):
    from parquet_to_postgres_spark.quality import validate_expectations

    df = spark.createDataFrame([(1,)], "id long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_expectations(df, {})


def test_validate_expectations_edge_contracts(spark):
    """Empty input reports 0 (not NULL); dotted rule names work;
    colliding input columns are refused loudly."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.quality import validate_expectations

    empty = spark.createDataFrame([], "id long, amount double")
    _, _, rep = validate_expectations(
        empty, {"amount.positive": F.col("amount") > 0}
    )
    rows = rep.collect()
    assert rows[0]["rule"] == "amount.positive"
    assert rows[0]["n_violations"] == 0 and rows[0]["frac_violations"] == 0.0

    import pytest as _p

    taken = spark.createDataFrame([(1, ["x"])], "id long, violations array<string>")
    with _p.raises(ValueError, match="violations"):
        validate_expectations(taken, {"r": F.col("id") > 0})
