"""Funnel operator: the greedy-latest DP must find the MAXIMUM
completed prefix (brute-force-verified), entirely JVM-side.

The brute force enumerates every increasing event chain matching the
step sequence under the gap budget — exponential, fine at test sizes —
so the DP's optimality claim (greedy-earliest is NOT optimal under a
gap; greedy-latest is) is checked against ground truth, not another
implementation of the same idea.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from parquet_to_postgres_spark.operators import funnel, funnel_counts

T0 = datetime(2024, 1, 1)


def _df(spark, rows):
    """rows: list of (user, seconds_offset, type)."""
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), y) for u, s, y in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _brute_force(evs, steps, gap_s):
    """Max completed prefix over all increasing chains (ground truth)."""
    evs = sorted(evs)
    best = 0

    def extend(stage, last_t):
        nonlocal best
        best = max(best, stage)
        if stage == len(steps):
            return
        for t, y in evs:
            if y != steps[stage]:
                continue
            if stage > 0:
                if t <= last_t:
                    continue
                if gap_s is not None and t - last_t > gap_s:
                    continue
            extend(stage + 1, t)

    extend(0, None)
    return best


def test_funnel_basic_progression(spark):
    df = _df(
        spark,
        [
            (1, 0, "A"), (1, 10, "B"), (1, 20, "C"),   # full funnel
            (2, 0, "A"), (2, 10, "C"),                 # stops at A
            (3, 0, "B"), (3, 10, "C"),                 # never starts
        ],
    )
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(df, "user_id", "ts", "event_type", ["A", "B", "C"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 0}


def test_funnel_greedy_earliest_counterexample(spark):
    """A@0, A@9, B@10 with gap 5: earliest-match dies (10-0 > 5), the
    latest-DP completes via the second A — the case that motivates the
    DP over plain greedy."""
    df = _df(spark, [(1, 0, "A"), (1, 9, "A"), (1, 10, "B")])
    r = funnel(
        df, "user_id", "ts", "event_type", ["A", "B"], max_gap_seconds=5
    ).collect()[0]
    assert r["steps_completed"] == 2


def test_funnel_strictly_after_and_gap_boundaries(spark):
    # same-timestamp events cannot chain; gap is inclusive (<=)
    df = _df(spark, [(1, 0, "A"), (1, 0, "B"), (2, 0, "A"), (2, 5, "B")])
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(
            df, "user_id", "ts", "event_type", ["A", "B"], max_gap_seconds=5
        ).collect()
    }
    assert got == {1: 1, 2: 2}


def test_funnel_matches_brute_force_on_generated_sequences(spark):
    """DP == exponential ground truth over ~60 deterministic random
    event sequences (3 types, up to 10 events, gap on/off)."""
    steps = ["A", "B", "C"]
    cases = []
    for i in range(60):
        h = hashlib.sha256(f"case{i}".encode()).digest()
        n = 4 + h[0] % 7
        evs = [
            (h[1 + j] % 30, "ABC"[h[11 + j] % 3]) for j in range(n)
        ]
        cases.append(evs)
    rows = []
    for uid, evs in enumerate(cases):
        rows += [(uid, t, y) for t, y in evs]
    df = _df(spark, rows)
    for gap in (None, 7):
        got = {
            r["user_id"]: r["steps_completed"]
            for r in funnel(
                df, "user_id", "ts", "event_type", steps, max_gap_seconds=gap
            ).collect()
        }
        for uid, evs in enumerate(cases):
            assert got[uid] == _brute_force(evs, steps, gap), (uid, evs, gap)


def test_funnel_step_ts_prefix_and_recency_semantics(spark):
    df = _df(spark, [(1, 0, "A"), (1, 3, "B"), (1, 10, "A")])
    r = funnel(df, "user_id", "ts", "event_type", ["A", "B"]).collect()[0]
    assert r["steps_completed"] == 2
    # per-stage recency: the LATER A wins stage 1 even though stage 2
    # completed from the earlier one
    assert r["step_ts"][0] == T0 + timedelta(seconds=10)
    assert r["step_ts"][1] == T0 + timedelta(seconds=3)


def test_funnel_rejects_duplicate_steps_and_drops_nulls(spark):
    df = _df(spark, [(1, 0, "A")])
    with pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", ["A", "A"])
    nulls = spark.createDataFrame(
        [(None, T0, "A"), (1, None, "A"), (1, T0, None), (1, T0, "A")],
        "user_id long, ts timestamp, event_type string",
    )
    got = funnel(nulls, "user_id", "ts", "event_type", ["A", "B"]).collect()
    assert len(got) == 1 and got[0]["steps_completed"] == 1


def test_funnel_counts_cumulative(spark):
    df = _df(
        spark,
        [
            (1, 0, "A"), (1, 1, "B"),
            (2, 0, "A"),
            (3, 0, "X"),
        ],
    )
    rows = {
        r["steps_completed"]: (r["n_users"], r["n_reached_at_least"])
        for r in funnel_counts(df, "user_id", "ts", "event_type", ["A", "B"]).collect()
    }
    assert rows == {0: (1, 3), 1: (1, 2), 2: (1, 1)}


def test_funnel_counts_dense_spine_when_no_dropoff(spark):
    """A stage where nobody stopped still appears (n_users=0) so the
    cumulative conversion column is complete."""
    df = _df(spark, [(1, 0, "A"), (1, 1, "B"), (2, 0, "A"), (2, 1, "B")])
    rows = {
        r["steps_completed"]: (r["n_users"], r["n_reached_at_least"])
        for r in funnel_counts(df, "user_id", "ts", "event_type", ["A", "B"]).collect()
    }
    assert rows == {0: (0, 2), 1: (0, 2), 2: (2, 2)}


def test_funnel_gap_validation(spark):
    df = _df(spark, [(1, 0, "A")])
    with pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", ["A", "B"], max_gap_seconds=0)
    with pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", ["A", "B"], max_gap_seconds=-1)
    # fractional budgets are honored at microsecond resolution
    sub = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 0, 0), "A"),
            (1, datetime(2024, 1, 1, 0, 0, 0, 400000), "B"),
            (2, datetime(2024, 1, 1, 0, 0, 0, 0), "A"),
            (2, datetime(2024, 1, 1, 0, 0, 0, 600000), "B"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(
            sub, "user_id", "ts", "event_type", ["A", "B"], max_gap_seconds=0.5
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_funnel_plan_is_one_aggregate_no_window(spark):
    """Per-user matching must be the collect+fold shape: one hash
    aggregate, no Window, no Python (the fold is a JVM expression)."""
    df = _df(spark, [(1, 0, "A")])
    out = funnel(df, "user_id", "ts", "event_type", ["A", "B", "C"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    p = buf.getvalue()
    assert "Window" not in p
    assert "Python" not in p and "ArrowEval" not in p
    # ONE exchange (user grain) — the r12 review caught a
    # groupBy(user, ts) pre-group that shuffled the event stream twice
    assert p.count("Exchange") == 1, p


# ------------------------------------------------------------ streaming ----


FUNNEL_STEPS = ["signup", "view", "purchase"]


def test_stream_funnel_single_batch_matches_batch_operator(spark):
    """availableNow over the events fixture in one micro-batch: the
    streaming stateful funnel equals the batch JVM-fold operator
    row-for-row (same shared DP semantics)."""
    from parquet_to_postgres_spark.streaming import ops
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    stream = ops.stream_funnel(
        ops.events_stream(spark, SF_SMOKE),
        "user_id", "ts", "event_type", FUNNEL_STEPS,
    )
    rows = ops.run_stream_to_df(stream, "update").collect()
    got = {(r["user_id"], r["steps_completed"]) for r in rows}
    # nothing was late in a single in-order batch (same run — the
    # first form re-executed the whole stateful query for this check)
    assert all(r["late_dropped"] == 0 for r in rows)
    batch = {
        (r["user_id"], r["steps_completed"])
        for r in funnel(
            load_table(spark, SF_SMOKE, "events"),
            "user_id", "ts", "event_type", FUNNEL_STEPS,
        ).collect()
    }
    assert got == batch


def test_stream_funnel_multi_batch_in_order_and_ties(spark):
    """Events split across micro-batches IN ORDER converge to the batch
    answer — including a tied timestamp straddling the batch boundary,
    which must fold against the stored pre-timestamp state; a genuinely
    LATE event is dropped and counted, never silently absorbed."""
    import os
    import tempfile

    from parquet_to_postgres_spark.streaming import ops

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    b1 = spark.createDataFrame(
        [
            # user 1: signup@9, signup@23 (tie partner arrives next batch)
            (1, T0 + timedelta(seconds=9), 1, "signup", 0.0, ""),
            (2, T0 + timedelta(seconds=23), 1, "signup", 0.0, ""),
            # user 2: signup@10
            (3, T0 + timedelta(seconds=10), 2, "signup", 0.0, ""),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            # user 1: view@23 TIES batch 1's last timestamp -> must chain
            # from signup@9 via the stored pre-timestamp state
            (4, T0 + timedelta(seconds=23), 1, "view", 0.0, ""),
            # user 2: LATE event (before signup@10) -> dropped + counted
            (5, T0 + timedelta(seconds=5), 2, "view", 0.0, ""),
        ],
        schema,
    )
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/in"
        os.makedirs(src)
        b1.coalesce(1).write.parquet(f"{d}/tmp1")
        b2.coalesce(1).write.parquet(f"{d}/tmp2")
        # one parquet FILE per batch, named so b1 lists first
        import glob
        import shutil

        shutil.copy(glob.glob(f"{d}/tmp1/part-*.parquet")[0], f"{src}/a_batch1.parquet")
        shutil.copy(glob.glob(f"{d}/tmp2/part-*.parquet")[0], f"{src}/b_batch2.parquet")
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = ops.run_stream_to_df(
            ops.stream_funnel(
                stream, "user_id", "ts", "event_type", FUNNEL_STEPS,
                max_gap_seconds=60,
            ),
            "update",
        )
        rows = out.collect()
        # steps_completed / late_dropped are monotone: final = max
        final = {}
        for r in rows:
            u = r["user_id"]
            prev = final.get(u, (0, 0))
            final[u] = (
                max(prev[0], r["steps_completed"]),
                max(prev[1], r["late_dropped"]),
            )
        assert final[1] == (2, 0)  # tie across the boundary chained
        assert final[2] == (1, 1)  # late event dropped AND counted


def test_funnel_fold_py_matches_jvm_fold(spark):
    """The shared Python reference (the streaming op's state engine)
    agrees with the JVM expression fold on the generated sweep."""
    from parquet_to_postgres_spark.operators import funnel_fold_py

    steps = ["A", "B", "C"]
    cases = []
    for i in range(40):
        h = hashlib.sha256(f"pycase{i}".encode()).digest()
        n = 4 + h[0] % 7
        cases.append(
            [(h[1 + j] % 30, "ABC"[h[11 + j] % 3]) for j in range(n)]
        )
    rows = []
    for uid, evs in enumerate(cases):
        rows += [(uid, t, y) for t, y in evs]
    df = _df(spark, rows)
    for gap in (None, 7):
        gap_us = None if gap is None else gap * 1_000_000
        jvm = {
            r["user_id"]: r["steps_completed"]
            for r in funnel(
                df, "user_id", "ts", "event_type", steps, max_gap_seconds=gap
            ).collect()
        }
        base = int(T0.timestamp()) * 1_000_000
        for uid, evs in enumerate(cases):
            _, completed = funnel_fold_py(
                [(base + t * 1_000_000, y) for t, y in evs], steps, gap_us
            )
            assert completed == jvm[uid], (uid, evs, gap)


# ------------------------------------------------------------ retention ----


def test_retention_cohorts_matches_duckdb(spark, duck):
    """Day- and week-grain retention over the events fixture equals the
    DuckDB SQL formulation cell-for-cell."""
    from parquet_to_postgres_spark.operators import retention_cohorts
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    # week truncates to ISO Monday on both engines; offsets use //
    # (truncating integer division — DuckDB's CAST(x/7 AS INT) rounds
    # to nearest, which silently disagreed with Spark's truncation on
    # 405/1000 fixture rows while the aggregate happened to coincide;
    # r12 review finding)
    forms = {
        "day": ("CAST(first.f AS DATE)", "CAST(e.ts AS DATE)", 1),
        "week": (
            "CAST(date_trunc('week', first.f) AS DATE)",
            "CAST(date_trunc('week', e.ts) AS DATE)",
            7,
        ),
    }
    for period, (cf, ct, days) in forms.items():
        got = sorted(
            (str(r["cohort"]), r["period_offset"], r["n_active"], r["cohort_size"])
            for r in retention_cohorts(events, "user_id", "ts", period).collect()
        )
        want = sorted(
            (str(r[0]), r[1], r[2], r[3])
            for r in duck.sql(f"""
                WITH first AS (
                  SELECT user_id, MIN(ts) AS f FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id
                ),
                tagged AS (
                  SELECT e.user_id,
                         {cf} AS cohort,
                         CAST(date_diff('day', {cf}, {ct}) // {days} AS INT)
                           AS period_offset
                  FROM events e JOIN first USING (user_id)
                  WHERE e.ts IS NOT NULL
                ),
                cells AS (
                  SELECT cohort, period_offset,
                         COUNT(DISTINCT user_id) AS n_active
                  FROM tagged GROUP BY 1, 2
                )
                SELECT c.cohort, c.period_offset, c.n_active, b.n_active
                FROM cells c JOIN cells b
                  ON b.cohort = c.cohort AND b.period_offset = 0
            """).fetchall()
        )
        assert got == want, period


def test_retention_week_same_week_starters_share_cohort(spark):
    """Mon and Tue starters of one ISO week land in ONE weekly cohort
    (the untruncated form fragmented weekly cohorts per start day)."""
    from parquet_to_postgres_spark.operators import retention_cohorts

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1)),   # Monday
            (2, datetime(2024, 1, 2)),   # Tuesday, same ISO week
            (1, datetime(2024, 1, 8)),   # next week
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (str(r["cohort"]), r["period_offset"]): (r["n_active"], r["cohort_size"])
        for r in retention_cohorts(df, "user_id", "ts", "week").collect()
    }
    assert got == {("2024-01-01", 0): (2, 2), ("2024-01-01", 1): (1, 2)}


def test_retention_month_offsets_cross_calendar_boundaries(spark):
    from parquet_to_postgres_spark.operators import retention_cohorts

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 31)), (1, datetime(2024, 2, 1)),
            (2, datetime(2024, 1, 1)), (2, datetime(2024, 3, 31)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (str(r["cohort"]), r["period_offset"]): r["n_active"]
        for r in retention_cohorts(df, "user_id", "ts", "month").collect()
    }
    # both cohorts are 2024-01; jan 31 -> feb 1 crosses ONE boundary,
    # jan 1 -> mar 31 crosses two
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
    }


def test_retention_rejects_bad_period(spark):
    from parquet_to_postgres_spark.operators import retention_cohorts

    df = spark.createDataFrame([(1, T0)], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", "year")


def test_stream_funnel_string_keys(spark):
    """The user column keeps the caller's name and type — a string-keyed
    product stream must work (the first build hardcoded bigint)."""
    import tempfile

    from parquet_to_postgres_spark.streaming import ops

    df = spark.createDataFrame(
        [
            ("alice", T0, "signup"),
            ("alice", T0 + timedelta(seconds=5), "view"),
            ("bob", T0, "view"),
        ],
        "visitor string, ts timestamp, event_type string",
    )
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/in"
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = ops.run_stream_to_df(
            ops.stream_funnel(
                stream, "visitor", "ts", "event_type", ["signup", "view"]
            ),
            "update",
        )
        got = {(r["visitor"], r["steps_completed"]) for r in out.collect()}
        assert got == {("alice", 2), ("bob", 0)}


# ------------------------------------------------------ rolling actives ----


def test_rolling_active_users_matches_duckdb(spark, duck):
    from parquet_to_postgres_spark.operators import rolling_active_users
    from parquet_to_postgres_spark.tables import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    for w in (1, 7):
        got = sorted(
            (str(r["day"]), r["n_active"])
            for r in rolling_active_users(events, "user_id", "ts", w).collect()
        )
        # the spine is the FULL calendar range (the operator emits
        # gap days with partial windows too — an observed-days-only
        # twin would only coincide on dense fixtures, the vacuous-
        # oracle trap)
        want = sorted(
            (str(r[0]), r[1])
            for r in duck.sql(f"""
                WITH bounds AS (
                  SELECT MIN(CAST(ts AS DATE)) AS lo,
                         MAX(CAST(ts AS DATE)) AS hi
                  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
                ),
                days AS (
                  SELECT CAST(unnest(generate_series(lo, hi,
                                     INTERVAL 1 DAY)) AS DATE) AS day
                  FROM bounds
                )
                SELECT d.day, COUNT(DISTINCT e.user_id) AS n_active
                FROM days d
                JOIN events e
                  ON e.user_id IS NOT NULL AND e.ts IS NOT NULL
                 AND CAST(e.ts AS DATE) BETWEEN d.day - {w - 1} AND d.day
                GROUP BY d.day
            """).fetchall()
        )
        assert got == want, w


def test_rolling_active_users_window_semantics(spark):
    from parquet_to_postgres_spark.operators import rolling_active_users

    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1)),
            (2, datetime(2024, 1, 2)),
            (1, datetime(2024, 1, 4)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        str(r["day"]): r["n_active"]
        for r in rolling_active_users(df, "user_id", "ts", 3).collect()
    }
    # day3 window = {1,2}: user 1 (day1) and 2 (day2); day4 = {2: day2, 1: day4}
    assert got == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-03": 2,
        "2024-01-04": 2,
    }
    import pytest as _p

    with _p.raises(ValueError):
        rolling_active_users(df, "user_id", "ts", 0)
