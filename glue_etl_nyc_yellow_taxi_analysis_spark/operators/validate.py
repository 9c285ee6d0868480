"""Data-quality validation operators — expectation-style rule checking.

A training-data pipeline needs machine-checkable ingest gates: each rule is
a named boolean Column; ``violation_counts`` evaluates ALL rules in one
pass over the data (a single aggregate, no per-rule scans) and returns one
row per rule with its violation count — the shape monitoring/alerting
consumes.  ``enforce`` filters rows violating any rule (the quality_filters
generalization).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, n_rows).

    All rules evaluate in a single scan — conditional-sum aggregation, one
    job, map-side combinable.  A rule Column is TRUE when the row PASSES;
    a NULL-evaluating rule (e.g. ``x > 0`` on a NULL x) counts as a
    VIOLATION — the same rows ``enforce`` drops, so the monitoring count
    always equals the enforcement delta (``when(~cond, 1)`` would count
    NULL as a pass while enforce removed the row).
    """
    aggs = [
        F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    totals = df.agg(F.count("*").alias("__n"), *aggs)
    # unpivot to (rule, n_violations, n_rows) — stack is JVM-side
    pairs = ", ".join(f"'{name}', {name}" for name in rules)
    return totals.select(
        F.expr(f"stack({len(rules)}, {pairs}) as (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    )


def enforce(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Keep only rows passing every rule (single fused predicate)."""
    return df.filter(reduce(lambda a, b: a & b, rules.values()))
