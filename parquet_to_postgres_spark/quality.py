"""Declarative data-quality validation: expectation checks as plans.

A pipeline gate, not a report: ``validate`` turns a rule list into the
minimum number of Spark jobs — every row-local rule (not-null, range,
set membership, regex) folds into ONE aggregate pass over the table;
uniqueness is one groupBy; referential integrity is one anti-join per
foreign key (broadcast when the dimension is small).  Output is one row
per rule: ``(rule, n_violations, passed)``.

The reference silently corrupts bad data (NULL slots read without
checks, /root/reference/src/main.rs:157); this module is the opposite
contract — violations are counted and surfaced before the write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named expectation.  ``predicate`` marks VIOLATING rows (row-local
    rules fold into one aggregate); ``kind`` selects the plan shape."""

    name: str
    kind: str  # "rowwise" | "unique" | "foreign_key"
    predicate: Column | None = None
    cols: tuple[str, ...] = ()
    dim: DataFrame | None = None
    dim_cols: tuple[str, ...] = ()


def not_null(*cols: str) -> list[Rule]:
    return [
        Rule(f"not_null({c})", "rowwise", F.col(c).isNull()) for c in cols
    ]


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col},{lo},{hi})",
        "rowwise",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def in_set(col: str, values: tuple) -> Rule:
    return Rule(
        f"in_set({col})",
        "rowwise",
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})",
        "rowwise",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", cols=cols)


def foreign_key(cols: tuple[str, ...], dim: DataFrame, dim_cols: tuple[str, ...]) -> Rule:
    return Rule(
        f"foreign_key({','.join(cols)})",
        "foreign_key",
        cols=cols,
        dim=dim,
        dim_cols=dim_cols,
    )


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run every rule; returns ``(rule, n_violations, passed)``.

    Row-local rules cost ONE shared aggregate pass regardless of rule
    count; each unique/foreign-key rule adds its own (necessary)
    shuffle.  Nothing is collected driver-side — the result is itself a
    (tiny) DataFrame, so the gate composes into a pipeline
    (``.where(~passed)`` → fail / quarantine).  An empty rule list (a
    real case for config-generated gates) returns an empty result frame
    rather than crashing."""
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame(
            [], "rule string, n_violations long, passed boolean"
        )
    results: list[DataFrame] = []

    rowwise = [r for r in rules if r.kind == "rowwise"]
    if rowwise:
        aggs = [
            F.count(F.when(r.predicate, 1)).alias(str(i))
            for i, r in enumerate(rowwise)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{r.name.replace(chr(39), '')}', `{i}`"
            for i, r in enumerate(rowwise)
        )
        results.append(
            wide.selectExpr(
                f"stack({len(rowwise)}, {stack}) as (rule, n_violations)"
            )
        )

    for r in rules:
        if r.kind == "unique":
            dupes = (
                df.groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias(
                        "n_violations"
                    )
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            results.append(dupes)
        elif r.kind == "foreign_key":
            dim = r.dim.select(
                *[F.col(d).alias(c) for c, d in zip(r.cols, r.dim_cols)]
            ).distinct()
            # SQL FK semantics: a row with any NULL key column is not a
            # violation — only fully-keyed rows must resolve in the dim
            all_keyed = F.lit(True)
            for c in r.cols:
                all_keyed = all_keyed & F.col(c).isNotNull()
            orphans = (
                df.select(*r.cols)
                .where(all_keyed)
                .join(F.broadcast(dim), list(r.cols), "left_anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            results.append(orphans)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)


def profile_drift(
    baseline: DataFrame,
    current: DataFrame,
    null_ratio_tol: float = 0.05,
    distinct_ratio_tol: float = 0.5,
    mean_rel_tol: float = 0.25,
) -> DataFrame:
    """Schema/statistics drift between two column profiles (the output
    of :func:`~.operators.profile_columns`) — the monitoring side of the
    quality gate: run the single-pass profiler per ingest batch, keep
    the previous profile, diff them.

    One row per column across both profiles:
    ``(column, status, null_ratio_delta, distinct_ratio, mean_rel_delta,
    drifted)`` where status ∈ added/removed/common.  Flags:

    - null-ratio moved by more than ``null_ratio_tol`` (absolute);
    - approx-distinct changed by more than ``distinct_ratio_tol``
      relative (HLL at rsd 2% never moves 50% on stable data);
    - numeric mean moved by more than ``mean_rel_tol`` relative.

    Both inputs are column-count-sized (one row per column), so the
    whole diff is a broadcast join of two tiny frames — cost lives in
    producing the profiles, one single-pass aggregate each."""
    # presence is carried by explicit markers, not inferred from derived
    # metrics: a profile row from an empty input has n_rows=0 and a NULL
    # null-ratio (try_divide — ANSI mode makes `/` throw on 0), which
    # would misclassify a genuinely common column
    b = baseline.select(
        "column",
        F.try_divide(F.col("n_null"), F.col("n_rows")).alias("b_null_ratio"),
        F.col("approx_distinct").alias("b_distinct"),
        F.col("mean").alias("b_mean"),
        F.lit(True).alias("in_b"),
    )
    c = current.select(
        "column",
        F.try_divide(F.col("n_null"), F.col("n_rows")).alias("c_null_ratio"),
        F.col("approx_distinct").alias("c_distinct"),
        F.col("mean").alias("c_mean"),
        F.lit(True).alias("in_c"),
    )
    j = b.join(c, "column", "full_outer")
    status = (
        F.when(F.col("in_b").isNull(), F.lit("added"))
        .when(F.col("in_c").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    null_delta = F.abs(F.col("c_null_ratio") - F.col("b_null_ratio"))
    distinct_ratio = F.when(
        F.col("b_distinct") > 0, F.col("c_distinct") / F.col("b_distinct")
    )
    mean_rel = F.when(
        F.col("b_mean").isNotNull()
        & F.col("c_mean").isNotNull()
        & (F.abs(F.col("b_mean")) > 0),
        F.abs(F.col("c_mean") - F.col("b_mean")) / F.abs(F.col("b_mean")),
    )
    drifted = (
        (status != "common")
        | (null_delta > null_ratio_tol)
        | F.coalesce(
            (distinct_ratio > 1 + distinct_ratio_tol)
            | (distinct_ratio < 1 - distinct_ratio_tol),
            F.lit(False),
        )
        | F.coalesce(mean_rel > mean_rel_tol, F.lit(False))
    )
    return j.select(
        "column",
        status.alias("status"),
        null_delta.alias("null_ratio_delta"),
        distinct_ratio.alias("distinct_ratio"),
        mean_rel.alias("mean_rel_delta"),
        drifted.alias("drifted"),
    )


def validate_expectations(
    df: "DataFrame",
    rules: "dict[str, Column]",
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """Expectations gate for ETL ingress: split rows into CLEAN (every
    rule holds) and QUARANTINED (at least one violated, annotated with
    the violated rule names), plus a per-rule violation report — the
    contract-enforcement step a pipeline runs before a sink, with the
    failures kept for triage instead of silently dropped.

    Complementary to :func:`validate`: that one REPORTS counts over
    ``Rule`` objects including non-row-local checks (uniqueness,
    foreign keys); this one SPLITS the rows themselves, so its rules
    must be row-local boolean Columns (a uniqueness violation is a
    property of the group, not a row — route those through
    :func:`validate` and a follow-up join if quarantining is needed).

    ``rules``: name -> boolean Column over the row.  A NULL rule result
    counts as a VIOLATION (ternary logic would otherwise let a NULL in
    a guarded column slide through an ``x > 0`` rule — fail-closed is
    the only safe default for a gate).

    Scale shape: the rule columns are evaluated ONCE in a single
    projection; clean/quarantine are two filters over it (one scan
    each if both are consumed — cache upstream for exactly-one-scan),
    and the report is one map-side-combinable aggregate of
    sum(violated) per rule — no shuffle wider than |rules| rows.
    Returns ``(clean, quarantined, report)``; quarantined carries a
    ``violations`` array<string> column, the report has (rule,
    n_violations, frac_violations)."""
    if not rules:
        raise ValueError("rules must be a non-empty dict of name -> Column")
    # internal flag columns are INDEX-named: a rule name with a dot
    # would parse as a struct accessor in F.col, and a user column
    # could collide with a rule-derived name (r12 review findings) —
    # positional names dodge both; the output/overwrite hazards that
    # remain are checked loudly.
    names = list(rules)
    viol_cols = [f"__viol_{i}" for i in range(len(names))]
    conflicts = [c for c in (*viol_cols, "violations") if c in df.columns]
    if conflicts:
        raise ValueError(
            f"input columns {conflicts} collide with the gate's internal/"
            "output names — rename them before validate_expectations"
        )
    flags = df.select(
        "*",
        *[
            (~F.coalesce(rules[n], F.lit(False))).alias(v)
            for n, v in zip(names, viol_cols)
        ],
    )
    any_viol = None
    for v in viol_cols:
        c = F.col(v)
        any_viol = c if any_viol is None else (any_viol | c)
    clean = flags.where(~any_viol).drop(*viol_cols)
    quarantined = (
        flags.where(any_viol)
        .withColumn(
            "violations",
            F.filter(
                F.array(
                    *[
                        F.when(F.col(v), F.lit(n))
                        for n, v in zip(names, viol_cols)
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
        )
        .drop(*viol_cols)
    )
    # coalesce: F.sum over ZERO rows is NULL — an empty partition/day
    # must report 0 violations, not a NULL that poisons downstream
    # comparisons (quality.validate's own pattern at line ~121)
    report = flags.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.coalesce(F.sum(F.col(v).cast("long")), F.lit(0)).alias(f"__s_{i}")
            for i, v in enumerate(viol_cols)
        ],
    )
    rows = [
        F.struct(
            F.lit(n).alias("rule"),
            F.col(f"__s_{i}").alias("n_violations"),
            (F.col(f"__s_{i}") / F.greatest(F.col("__n"), F.lit(1)))
            .alias("frac_violations"),
        )
        for i, n in enumerate(names)
    ]
    report = report.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.rule", "r.n_violations", "r.frac_violations"
    )
    return clean, quarantined, report
