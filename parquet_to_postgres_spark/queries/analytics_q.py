"""Product-analytics declared queries (r13): funnel conversion counts
and cohort retention — the two reports VERDICT r12 marked gate-ready
(their DuckDB twins were already cell-for-cell in tests/test_funnel.py).

Each builder drives the LIBRARY operator (operators.funnel_counts /
operators.retention_cohorts), not a reimplementation, so the hash row
certifies the operator users actually call.

Oracle notes:

- The funnel DP (greedy-latest with simultaneous-timestamp commits) is
  equivalent to greedy-EARLIEST chain matching when no gap budget is
  set: a user completes >= j steps iff a strictly-increasing chain
  exists, and taking the earliest qualifying event at every stage
  preserves chain existence (any witness time t_i >= the greedy g_i, so
  the next witness still qualifies).  That makes the oracle a cascade
  of MIN-aggregates — fully ANSI-SQL — while the gap-budgeted variant
  (where greedy-earliest is provably non-optimal; see the brute-force
  suite in tests/test_funnel.py) stays covered by the pytest
  brute-force sweep.
- The retention twin truncates BOTH the cohort and the activity week to
  ISO Monday and uses DuckDB's truncating ``//`` for the week offset —
  ``CAST(x/7 AS INT)`` rounds to NEAREST and only coincides on dense
  fixtures (r12 review finding, recorded in the verify skill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import attribution_report, funnel_counts, retention_cohorts
from ..tables import Catalog
from . import register

FUNNEL_STEPS = ("signup", "view", "purchase")
ATTRIBUTION_TOUCHES = ("click", "view", "signup")
ATTRIBUTION_LOOKBACK_S = 3600


def _funnel_oracle(steps: "tuple[str, ...]" = FUNNEL_STEPS) -> str:
    """Greedy-earliest chain cascade: s_j = each user's earliest step-j
    event strictly after their s_{j-1} time."""
    ctes = [
        f"""s1 AS (
      SELECT user_id, MIN(ts) AS t FROM base
      WHERE event_type = '{steps[0]}' GROUP BY user_id
    )"""
    ]
    for j in range(2, len(steps) + 1):
        ctes.append(
            f"""s{j} AS (
      SELECT b.user_id, MIN(b.ts) AS t FROM base b JOIN s{j - 1} USING (user_id)
      WHERE b.event_type = '{steps[j - 1]}' AND b.ts > s{j - 1}.t
      GROUP BY b.user_id
    )"""
        )
    n = len(steps)
    whens = "\n             ".join(
        f"WHEN s{j}.t IS NOT NULL THEN {j}" for j in range(n, 0, -1)
    )
    joins = "\n      ".join(
        f"LEFT JOIN s{j} ON s{j}.user_id = u.user_id" for j in range(1, n + 1)
    )
    return f"""
    WITH base AS (
      SELECT user_id, ts, event_type FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    {",".join(ctes)},
    users AS (SELECT DISTINCT user_id FROM base),
    per_user AS (
      SELECT u.user_id,
             CASE {whens}
             ELSE 0 END AS steps_completed
      FROM users u
      {joins}
    ),
    counts AS (
      SELECT steps_completed, COUNT(*) AS n_users FROM per_user GROUP BY 1
    ),
    spine AS (
      SELECT CAST(unnest(range(0, {n + 1})) AS INT) AS steps_completed
    ),
    dense AS (
      SELECT s.steps_completed, COALESCE(c.n_users, 0) AS n_users
      FROM spine s LEFT JOIN counts c USING (steps_completed)
    )
    SELECT steps_completed,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(SUM(n_users) OVER (ORDER BY steps_completed DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_reached_at_least
    FROM dense
    """


@register("funnel_counts", oracle=_funnel_oracle(), tags=("ops", "analytics"))
def funnel_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion report over the events stream: how many users
    stopped at each stage of signup -> view -> purchase, with the
    cumulative reached-at-least column on a DENSE stage spine.

    The operator (operators.funnel_counts over operators.funnel) is ONE
    user-grain aggregate whose matching DP is a pure JVM expression
    fold — no window over the event stream, no Python, one exchange —
    then a (len(steps)+1)-row spine window.  Unbounded gap here (the
    SQL-equivalence precondition; see module docstring); the gap-budget
    path is brute-force-verified in tests/test_funnel.py."""
    t = Catalog(spark, sf_dir)
    return funnel_counts(
        t.events, "user_id", "ts", "event_type", list(FUNNEL_STEPS)
    )


RETENTION_ORACLE = """
    WITH first AS (
      SELECT user_id, MIN(ts) AS f FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id
    ),
    tagged AS (
      SELECT e.user_id,
             CAST(date_trunc('week', first.f) AS DATE) AS cohort,
             CAST(date_diff('day',
                            CAST(date_trunc('week', first.f) AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7
                  AS INT) AS period_offset
      FROM events e JOIN first USING (user_id)
      WHERE e.ts IS NOT NULL
    ),
    cells AS (
      SELECT cohort, period_offset, COUNT(DISTINCT user_id) AS n_active
      FROM tagged GROUP BY 1, 2
    )
    SELECT CAST(c.cohort AS TIMESTAMP) AS cohort,
           c.period_offset, c.n_active,
           b.n_active AS cohort_size
    FROM cells c JOIN cells b
      ON b.cohort = c.cohort AND b.period_offset = 0
    """


@register("retention_cohorts", oracle=RETENTION_ORACLE, tags=("ops", "analytics"))
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    ISO week, counted distinct in every week they return, with the
    cohort's size repeated per row.

    Weekly grain exercises the both-ends truncation rule (same-week
    starters share ONE cohort; offsets are exact multiples of 7 days —
    the r12 fragmentation finding).  Plan shape: a map-side-combinable
    min for first activity, an equi-join back on the user key, one
    (cohort, offset) count-distinct — all shuffles on shrinking grains,
    nothing collected."""
    t = Catalog(spark, sf_dir)
    out = retention_cohorts(t.events, "user_id", "ts", period="week")
    # the operator's cohort is a DATE; the gate compares through pandas,
    # where DuckDB renders DATE as midnight Timestamp — normalize both
    # sides to timestamp (every other fixture date is a timestamp too)
    return out.select(
        F.col("cohort").cast("timestamp").alias("cohort"),
        "period_offset",
        "n_active",
        "cohort_size",
    )


# last_touch for the GATE: every credit is exactly 1.0, so the summed
# credit is an integer-valued double — bit-deterministic on both
# engines.  linear's 1/n fractional credits stay pytest-covered
# (tests/test_analytics_ops.py has the cell-for-cell twin per model);
# a float-fraction SUM would be the classic last-ulp hash flake the
# verify skill warns about.
ATTRIBUTION_ORACLE = f"""
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS t, event_type AS y FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    conv AS (SELECT user_id, t FROM base WHERE y = 'purchase'),
    attr AS (
      SELECT (SELECT g.y FROM base g
              WHERE g.user_id = c.user_id
                AND g.y IN {ATTRIBUTION_TOUCHES!r}
                AND g.t < c.t
                AND g.t >= c.t - {ATTRIBUTION_LOOKBACK_S * 1_000_000}
              ORDER BY g.t DESC, g.y DESC LIMIT 1) AS touch_type
      FROM conv c
    )
    SELECT touch_type,
           CAST(COUNT(*) AS DOUBLE) AS n_rows,
           CAST(COUNT(*) AS DOUBLE) AS credit
    FROM attr GROUP BY touch_type
    """


@register(
    "attribution_report", oracle=ATTRIBUTION_ORACLE, tags=("ops", "analytics")
)
def attribution_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel attribution report (promoted to the gate in r14 —
    VERDICT item 2): every purchase credited to the LAST qualifying
    touch (click/view/signup) strictly before it within a 1-hour
    lookback, rolled up per channel; unattributed conversions surface
    as the NULL-channel row, never dropped.

    Drives the library operator (operators.attribution_report over
    attribute_conversions): ONE user-grain shuffle, RANGE-framed window
    on unix_micros so boundary-microsecond ties are order-independent
    (struct max, not row order), then a channel-grain rollup.  The
    oracle replays the same rule as a correlated ORDER BY t DESC, y
    DESC LIMIT 1 — the deterministic tie-break is part of the declared
    semantics.  The lookback BITES on the fixture (some purchases have
    only stale touches — pinned in tests/test_analytics_ops.py), so
    the window-bound leg is non-vacuous."""
    t = Catalog(spark, sf_dir)
    return attribution_report(
        t.events,
        "user_id",
        "ts",
        "event_type",
        "purchase",
        list(ATTRIBUTION_TOUCHES),
        model="last_touch",
        lookback_seconds=ATTRIBUTION_LOOKBACK_S,
    )


# The sketch values themselves cannot hash-match DuckDB (engines'
# sketches differ) — the approx_sketches oracle pattern: exact columns
# hash-matched cell-for-cell, booleans asserting the estimate/α bound
# (a sketch regression flips a cell and fails the gate).
SKETCH_CUBE_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE value IS NOT NULL
                                   AND isfinite(value)) AS BIGINT) AS n_values,
           COUNT(DISTINCT user_id) AS exact_users,
           true AS hll_ok,
           true AS p50_ok
    FROM events
    WHERE ts IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    """

SKETCH_CUBE_SPLIT = "2024-01-16"


@register("sketch_cube_slice", oracle=SKETCH_CUBE_ORACLE, tags=("A3", "A7", "ops"))
def sketch_cube_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted sketch-cube store on the gate (r14 — VERDICT item
    3): build a DISTINCT-COUNT cube (Datasketches HLL via Spark's
    hll_sketch_agg) and a QUANTILE cube (DDSketch-style log buckets) at
    (day, event_type) grain, as a backfill ``write_*_rollup`` plus a
    disjoint-increment ``append_*_rollup`` (build→append→slice, the
    store's real lifecycle), then answer an event_type slice from CELL
    rows — never re-scanning raw events.

    Build-once/probe-many rides the shared content-keyed
    :func:`~..operators.build_once` marker (source file stat + params +
    a digest of the operators module and this builder — code edits
    auto-invalidate), same economics as ivfpq_index_probe: the bench's
    repeat runs price the PROBE (cell-row scans, planning-time
    partition pruning), the first run / changed fixture / changed code
    prices the build.

    Output: exact ``n_rows`` (HLL store, additive over disjoint
    increments) and ``n_values`` (quantile store, finite non-null
    values) — both hash-matched against raw-event counts, certifying
    the store lost nothing across build+append — plus ``exact_users``
    and the bound booleans: ``hll_ok`` (store estimate within 10% of
    exact distinct; lg_config_k=12 is ~2% rsd) and ``p50_ok`` (store
    p50 between the exact quartiles — interpolation-free bracket, the
    approx_sketches pattern)."""
    import os

    from .. import operators as ops_mod
    from ..operators import (
        append_qsketch_rollup,
        append_sketch_rollup,
        build_once,
        content_key,
        qsketch_slice,
        sketch_slice,
        write_qsketch_rollup,
        write_sketch_rollup,
    )
    from .etl_q import _scratch

    t = Catalog(spark, sf_dir)
    # event_type IS NOT NULL mirrors the oracle: a NULL group would
    # never equi-join across the store legs and silently vanish from
    # the Spark side only (r14 review finding — latent fixture-drift
    # gate failure)
    events = t.events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).withColumn("day", F.to_date("ts"))
    # digest the WHOLE operators module + this builder (content_key's
    # documented contract): a spurious rebuild costs seconds, a stale
    # store serves wrong slices
    key = content_key(
        os.path.join(sf_dir, "events.parquet"),
        {
            "keys": ["day", "event_type"],
            "hll": {"distinct_col": "user_id", "lg_config_k": 12},
            "qsketch": {"value_col": "value", "alpha": 0.01},
            "split": SKETCH_CUBE_SPLIT,
        },
        ops_mod,
        sketch_cube_slice,
        # explicit session: getActiveSession is thread-local and can
        # be None in a multithreaded driver (r15 review finding)
        spark=spark,
    )
    path = _scratch(
        f"sketchcube/gate_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    hll_store, q_store = f"{path}/hll", f"{path}/qsketch"
    keys = ["day", "event_type"]
    split = F.lit(SKETCH_CUBE_SPLIT).cast("date")

    def build():
        base = events.where(F.col("day") < split)
        incr = events.where(F.col("day") >= split)
        write_sketch_rollup(base, hll_store, keys, "user_id")
        append_sketch_rollup(incr, hll_store, keys, "user_id")
        write_qsketch_rollup(base, q_store, keys, "value")
        append_qsketch_rollup(incr, q_store, keys, "value")

    build_once(spark, path, key, build)
    hll = sketch_slice(spark, hll_store, ["event_type"])
    q = qsketch_slice(spark, q_store, ["event_type"], [0.5])
    # percentile ignores NULLs but not NaN/inf — feed it only the
    # finite values the q store sketched (symmetry with qsketch's
    # documented non-finite drop)
    finite_v = (
        "CASE WHEN value IS NOT NULL AND NOT isnan(value) "
        "AND abs(value) != double('inf') THEN value END"
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr(f"percentile({finite_v}, 0.25)").alias("p25"),
        F.expr(f"percentile({finite_v}, 0.75)").alias("p75"),
    )
    # left-join the quantile leg: qsketch_rollup drops non-finite/NULL
    # values BEFORE grouping, so a group whose values are all
    # unsketchable has NO q cell — the oracle keeps it with n_values=0,
    # and an inner join would drop the whole row (r14 review finding).
    # The hll leg groups ALL rows, so it owns the group spine.
    # p50 is a DDSketch bucket REPRESENTATIVE (within α=1% of the true
    # median, almost never equal to it), so the quartile bracket gets
    # an α-scaled slack — a near-constant value column has
    # p75-p25 below the bucket quantization and the bare bracket would
    # flip false (r14 review finding; |true| <= |est|/(1-α), so
    # 0.02·|est| covers α·|true| with margin).  The bracket is only
    # provably sound for n >= 3: at n=2 the store's p50 is the LARGER
    # value (rank ceil(0.5·(n−1)) = 1) while the exact p75 interpolates
    # between the two — ceil(0.5m) <= 0.75m fails at m=1 (second r14
    # review finding) — so tiny groups pass trivially; the α guarantee
    # itself is pytest-pinned against exact sorted ranks.
    slack = 0.02 * F.abs(F.col("p50")) + F.lit(1e-9)
    return (
        hll.join(q, "event_type", "left")
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_rows",
            F.coalesce("n_values", F.lit(0)).alias("n_values"),
            "exact_users",
            (
                F.abs(F.col("n_distinct_approx") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("hll_ok"),
            F.when(F.coalesce("n_values", F.lit(0)) < 3, F.lit(True))
            .otherwise(
                (F.col("p50") >= F.col("p25") - slack)
                & (F.col("p50") <= F.col("p75") + slack)
            )
            .alias("p50_ok"),
        )
    )
