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

from ..operators import funnel_counts, retention_cohorts
from ..tables import Catalog
from . import register

FUNNEL_STEPS = ("signup", "view", "purchase")


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
