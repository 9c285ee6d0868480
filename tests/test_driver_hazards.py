"""Structural immunity against the rounds-1..3 driver-gate failure class.

The external driver canonicalizes EVERY declared query's output through
pandas (Spark ``toPandas()`` vs DuckDB ``.df()``).  Three hazard classes
hash-fail (or crash) there even when values agree:

1. Array/Map/Struct cells — unhashable in the canonicalizer's
   ``sort_values`` (r2: ``q_multimodal_features`` ERR);
2. Decimal columns — object dtype vs float64 (r1: ``q_rename_cast``);
3. int-vs-float dtype lanes (DuckDB SUM -> HUGEINT -> float64 vs Spark
   int64; the r2 five-query hash-fail class) — covered value-level by the
   bit-exact gate in tools/check_oracle.py, which every oracle runs
   through.

This test walks the FULL declared registry and rejects any regression
into the schema-level classes, so the failure mode is structurally
impossible, not just currently absent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE, QUERIES

@pytest.fixture(scope="module")
def built(spark, sf_dir):
    """One registry walk shared by every hazard gate: building all 351
    query DataFrames dominates this module's wall (many lanes run eager
    fixture work at build time), so schema and plan are captured from
    the SAME build instead of walking the registry once per fixture."""
    out = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:  # streaming/stateful lanes that refuse a plan dump
            plan = ""
        out[name] = (df.schema, plan)
    return out


@pytest.fixture(scope="module")
def schemas(built):
    return {name: schema for name, (schema, _) in built.items()}


def test_no_unhashable_or_decimal_output_columns(schemas):
    bad = []
    for name, schema in schemas.items():
        for f in schema.fields:
            if isinstance(
                f.dataType,
                (T.DecimalType, T.ArrayType, T.MapType, T.StructType),
            ):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"driver-hazard output dtypes: {bad}"


def test_oracle_entries_cover_declared_queries_only(schemas):
    orphan = [n for n in ORACLE if n not in schemas]
    assert not orphan, f"oracle SQL for undeclared queries: {orphan}"


@pytest.fixture(scope="module")
def plans(built):
    """Initial physical plan per declared query (no execution)."""
    return {name: plan for name, (_, plan) in built.items()}


def test_no_cartesian_product_anywhere(plans):
    """No declared query may compile to a CartesianProduct — a plan
    that's quadratic in PARTITIONS is a scale-killer whatever the row
    counts.  (Tiny deliberate cross joins compile to
    BroadcastNestedLoopJoin, which is allowed and audited per-query in
    test_plans.py.)"""
    offenders = sorted(n for n, p in plans.items() if "CartesianProduct" in p)
    assert offenders == []


# The declared row-batched Python surfaces: UDTF evaluation is
# BatchEvalPython by construction (Spark has no Arrow UDTF path).
_PYTHON_EVAL_ALLOWED = {"q_udtf_doc_chunk"}


def test_no_row_at_a_time_python_anywhere(plans):
    """Row-at-a-time Python (BatchEvalPython outside the declared UDTF
    lane) is the 10-100x slow path this engine bans: every other Python
    surface is Arrow-vectorized (mapInPandas/mapInArrow/applyIn*)."""
    offenders = sorted(
        n
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in _PYTHON_EVAL_ALLOWED
    )
    assert offenders == []
