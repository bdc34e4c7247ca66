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


def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    ISO week, counted distinct in every week they return, with the
    cohort's size repeated per row.

    Weekly grain exercises the both-ends truncation rule (same-week
    starters share ONE cohort; offsets are exact multiples of 7 days —
    the r12 fragmentation finding).  Plan shape: a map-side-combinable
    min for first activity, an equi-join back on the user key, one
    (cohort, offset) count-distinct — all shuffles on shrinking grains,
    nothing collected.

    Rotated out of the 50-slot registry in round 15 (slot given to
    stratified_weighted_sample, closing L9b's declared-cover gap); the
    analytics family stays declared via funnel_counts +
    attribution_report, and the operator keeps its cell-for-cell
    DuckDB twins in tests/test_funnel.py plus full oracle coverage in
    tests/test_registry.py; the scale probe keeps measuring it via a
    direct-import builder."""
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
    from .. import operators as ops_mod
    from ..operators import (
        append_qsketch_rollup,
        append_sketch_rollup,
        build_once,
        qsketch_slice,
        sketch_slice,
        write_qsketch_rollup,
        write_sketch_rollup,
    )
    from ._util import gate_store

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
    path, key = gate_store(
        spark, sf_dir, "events.parquet", "sketchcube",
        {
            "keys": ["day", "event_type"],
            "hll": {"distinct_col": "user_id", "lg_config_k": 12},
            "qsketch": {"value_col": "value", "alpha": 0.01},
            "split": SKETCH_CUBE_SPLIT,
        },
        ops_mod,
        sketch_cube_slice,
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


# The audience-overlap oracle: the hash-matched legs are EXACT values
# DuckDB recomputes from raw events (store row counts certify the
# build+append lifecycle lost nothing; the distinct legs anchor the
# bound booleans to a verified baseline); the booleans state the KMV
# estimator's guarantees — EQUALITY whenever the true cardinality is
# under k (a min-k sample of < k members is exhaustive, so the
# estimate IS the exact count) and a 4-sigma band above it.  Both
# regimes are live on the sf0.01 fixture at k=64: 28 of 30 days have
# exact side sketches, every daily union (80-97 users) estimates.
KMV_OVERLAP_K = 64
KMV_AUDIENCE_OVERLAP_ORACLE = """
    WITH base AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id, event_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    s AS (SELECT day, user_id FROM base WHERE event_type = 'signup'),
    p AS (SELECT day, user_id FROM base WHERE event_type = 'purchase'),
    days AS (SELECT day FROM s GROUP BY day
             INTERSECT SELECT day FROM p GROUP BY day)
    SELECT d.day,
      (SELECT COUNT(*) FROM s WHERE s.day = d.day) AS n_signup_rows,
      (SELECT COUNT(*) FROM p WHERE p.day = d.day) AS n_purchase_rows,
      (SELECT COUNT(DISTINCT user_id) FROM s WHERE s.day = d.day) AS n_signup,
      (SELECT COUNT(DISTINCT user_id) FROM p WHERE p.day = d.day) AS n_purchase,
      (SELECT COUNT(DISTINCT user_id) FROM (
          SELECT user_id FROM s WHERE s.day = d.day
          UNION SELECT user_id FROM p WHERE p.day = d.day)) AS n_union,
      (SELECT COUNT(DISTINCT user_id) FROM (
          SELECT user_id FROM s WHERE s.day = d.day
          INTERSECT SELECT user_id FROM p WHERE p.day = d.day)) AS n_overlap,
      true AS sides_ok,
      true AS union_ok,
      true AS overlap_ok,
      true AS jaccard_ok
    FROM days d
    """


@register(
    "kmv_audience_overlap",
    oracle=KMV_AUDIENCE_OVERLAP_ORACLE,
    tags=("A3", "analytics", "store"),
)
def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV set-operation family on the gate (promoted r15 — VERDICT
    item 1): per-day audience overlap — how many distinct users did
    BOTH signup and purchase — answered from persisted KMV bottom-k
    sketch cells, never raw events.  This is the question the HLL cube
    cannot answer (HLL unions but never intersects); the KMV min-k
    sample supports union, INTERSECTION, and Jaccard between any two
    cells (Beyer et al. SIGMOD'07; Cohen's bottom-k estimator).

    Lifecycle under test, same shape as sketch_cube_slice: backfill
    ``write_kmv_rollup`` + disjoint-increment ``append_kmv_rollup``
    (split at SKETCH_CUBE_SPLIT) behind the shared content-keyed
    :func:`~..operators.build_once` marker; the report is two
    ``kmv_slice(estimate=False)`` re-mergeable slices (partition
    pruning on event_type at planning time) through
    :func:`~..operators.kmv_set_cardinalities`.

    Output per day: the store's additive ``n_*_rows`` (exact — hash-
    matched, certifying zero loss across build+append), the exact
    distinct legs recomputed from raw (hash-matched; union via one
    grouped triple count-distinct, overlap by inclusion-exclusion),
    and four booleans binding the sketch estimates to them:
    EXACT-EQUALITY whenever the true cardinality is under k=64 (an
    unsaturated min-k sample is the member set itself — conditioned on
    the EXACT count, not the estimate: a saturated sketch of ~k
    members can estimate below k without being exact), a 4-sigma
    relative band (4/sqrt(k-2) ~ 0.51) above it; the intersection and
    Jaccard bands are stated against the union (Cohen's estimator
    errors scale with |A u B|, not |A n B|).  Both regimes are LIVE on
    the sf0.01 gate fixture: 28/30 days have exhaustive side sketches,
    every daily union (80-97 members > k) exercises the estimator."""
    from .. import operators as ops_mod
    from ..operators import (
        append_kmv_rollup,
        build_once,
        kmv_set_cardinalities,
        kmv_slice,
        write_kmv_rollup,
    )
    from ._util import gate_store

    t = Catalog(spark, sf_dir)
    k = KMV_OVERLAP_K
    events = t.events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).withColumn("day", F.to_date("ts").cast("string"))
    keys = ["event_type", "day"]
    path, key = gate_store(
        spark, sf_dir, "events.parquet", "kmvoverlap",
        {
            "keys": keys,
            "member_col": "user_id",
            "k": k,
            "split": SKETCH_CUBE_SPLIT,
        },
        ops_mod,
        kmv_audience_overlap,
    )
    store = f"{path}/store"

    def build():
        base = events.where(F.col("day") < SKETCH_CUBE_SPLIT)
        incr = events.where(F.col("day") >= SKETCH_CUBE_SPLIT)
        # partitioned by event_type so each audience slice prunes to
        # ONE directory at planning time
        write_kmv_rollup(
            base, store, keys, "user_id",
            partition_keys=["event_type"], k=k,
        )
        append_kmv_rollup(incr, store, keys, "user_id", k=k)

    build_once(spark, path, key, build)
    a = kmv_slice(
        spark, store, ["day"],
        where=F.col("event_type") == "signup", estimate=False,
    )
    b = kmv_slice(
        spark, store, ["day"],
        where=F.col("event_type") == "purchase", estimate=False,
    )
    # rename the estimate legs up front: the exact certification frame
    # reuses the natural names (n_union ...) for the HASH-MATCHED
    # columns, and an un-renamed join would be ambiguous
    ov = kmv_set_cardinalities(a, b, ["day"]).select(
        "day",
        F.col("n_left").alias("est_signup"),
        F.col("n_right").alias("est_purchase"),
        F.col("n_union").alias("est_union"),
        F.col("n_intersection").alias("est_overlap"),
        "jaccard",
    )
    rows_a = a.select("day", F.col("n_rows").alias("n_signup_rows"))
    rows_b = b.select("day", F.col("n_rows").alias("n_purchase_rows"))
    # the exact certification leg: one grouped scan, overlap by
    # inclusion-exclusion (countDistinct over both types = |A u B|)
    sig = F.when(F.col("event_type") == "signup", F.col("user_id"))
    pur = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    exact = (
        events.where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("day")
        .agg(
            F.countDistinct(sig).alias("n_signup"),
            F.countDistinct(pur).alias("n_purchase"),
            F.countDistinct("user_id").alias("n_union"),
        )
        .withColumn(
            "n_overlap",
            F.col("n_signup") + F.col("n_purchase") - F.col("n_union"),
        )
    )
    band = 4.0 / (k - 2) ** 0.5  # 4 sigma of the KMV rsd 1/sqrt(k-2)

    def est_ok(est, exact_col, scale_col):
        # exactness conditioned on the EXACT count being under k: an
        # unsaturated min-k sample is the member set itself; a
        # saturated sketch of ~k members can ESTIMATE below k without
        # being exact, so conditioning on the estimate would be wrong
        return (
            F.when(F.col(exact_col) < k, est == F.col(exact_col))
            .otherwise(F.abs(est - F.col(exact_col)) <= band * F.col(scale_col))
        )

    # zero-guarded like the estimator's own m > 0 arm: a day whose
    # users are all NULL has cells (n_rows > 0, empty sketches) and an
    # exact union of 0 — a bare division would make jaccard_ok NULL
    # and hash-mismatch the oracle's literal true (r15 review finding,
    # the r14 NULL-group latent-drift class)
    jac_exact = F.when(
        F.col("n_union") > 0,
        F.col("n_overlap").cast("double") / F.col("n_union").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        ov.join(rows_a, "day")
        .join(rows_b, "day")
        .join(exact, "day")
        .select(
            "day",
            "n_signup_rows",
            "n_purchase_rows",
            "n_signup",
            "n_purchase",
            "n_union",
            "n_overlap",
            (
                est_ok(F.col("est_signup"), "n_signup", "n_signup")
                & est_ok(F.col("est_purchase"), "n_purchase", "n_purchase")
            ).alias("sides_ok"),
            est_ok(F.col("est_union"), "n_union", "n_union").alias("union_ok"),
            # intersection/Jaccard errors scale with the UNION
            F.when(
                F.col("n_union") < k,
                F.col("est_overlap") == F.col("n_overlap"),
            )
            .otherwise(
                F.abs(F.col("est_overlap") - F.col("n_overlap"))
                <= band * F.col("n_union")
            )
            .alias("overlap_ok"),
            F.when(
                F.col("n_union") < k,
                F.abs(F.col("jaccard") - jac_exact) < 1e-12,
            )
            .otherwise(F.abs(F.col("jaccard") - jac_exact) <= 0.25)
            .alias("jaccard_ok"),
        )
    )


# The census oracle pins the operator's DETERMINISTIC guarantees and
# nothing more: WHICH non-guaranteed candidates survive Misra-Gries
# compression varies with partitioning and Arrow batch boundaries (the
# documented contract), but (1) every item whose true frequency
# exceeds n/(k+1) is GUARANTEED present (Agarwal et al., PODS'12
# mergeability), and (2) est <= true <= max holds for every returned
# item — so the query emits the guaranteed items with their EXACT
# counts (hash-matched) plus the two theorem booleans, and never the
# run-varying est/max values themselves.
CENSUS_K = 128
HEAVY_HITTERS_CENSUS_ORACLE = f"""
    WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS item, COUNT(*) AS n_events
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(n_events) AS n FROM counts)
    SELECT item, n_events, true AS present, true AS bounds_ok
    FROM counts, tot WHERE n_events > n / {CENSUS_K + 1}.0
    """


@register(
    "heavy_hitters_census",
    oracle=HEAVY_HITTERS_CENSUS_ORACLE,
    tags=("analytics", "census"),
)
def heavy_hitters_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Misra-Gries heavy-hitter census on the gate (promoted r15 —
    VERDICT item 2): the zero-DATA-shuffle first-pass census
    (:func:`~..operators.frequent_items`) over event actors, certified
    through its deterministic theorems.  Each partition folds into a
    <= k-entry summary with NO exchange (mapInPandas straight off the
    scan — plan-pinned in tests/test_analytics_ops.py); the merge is
    item-grain (<= P*(k+1) tiny rows), never event-grain.

    k=128 is chosen so BOTH operator regimes are live on the gate
    fixture: sf0.01 has 150 distinct users, so the summaries compress
    (real decrements, est < exact) AND 19 users still clear the
    n/(k+1) coverage threshold; sf0.001's 15 users stay under k
    (exact regime, zero decrement).

    Output, one row per GUARANTEED item (true frequency > n/(k+1),
    recomputed exactly in-query): the item, its exact count (both
    hash-matched against DuckDB's exact GROUP BY), ``present`` (the
    PODS'12 coverage theorem: a guaranteed item is in the census under
    ANY partitioning), and ``bounds_ok`` (est <= exact <= max).  The
    run-varying est/max values are deliberately NOT emitted — the
    docstring contract says never to snapshot-compare them."""
    from ..operators import frequent_items

    t = Catalog(spark, sf_dir)
    k = CENSUS_K
    census = frequent_items(t.events, "user_id", k=k).select(
        F.col("item").alias("__c_item"),
        "est_count",
        "max_count",
        F.lit(True).alias("__present"),
    )
    exact = t.events.groupBy(
        F.col("user_id").cast("string").alias("item")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # the threshold total rides a single-row broadcast cross join, not
    # a window over the user-grain frame (an unbounded window would
    # single-partition the whole user table at scale); counted straight
    # off the scan — summing the exact leg's groups would rebuild the
    # whole item-grain aggregate a second time
    total = t.events.agg(F.count(F.lit(1)).alias("__n"))
    guaranteed = exact.crossJoin(F.broadcast(total)).where(
        F.col("n_events") > F.col("__n") / F.lit(float(k + 1))
    )
    # census is a <= k-row local frame; NULL-SAFE join so a NULL-user
    # heavy hitter (the census tracks NULL as its own item) cannot
    # silently read as absent
    j = guaranteed.join(
        F.broadcast(census),
        F.col("item").eqNullSafe(F.col("__c_item")),
        "left",
    )
    return j.select(
        "item",
        "n_events",
        F.coalesce("__present", F.lit(False)).alias("present"),
        (
            F.coalesce("__present", F.lit(False))
            & (F.col("est_count") <= F.col("n_events"))
            & (F.col("n_events") <= F.col("max_count"))
        ).alias("bounds_ok"),
    )
