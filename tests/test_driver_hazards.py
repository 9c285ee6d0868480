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
def schemas(spark, sf_dir):
    out = {}
    for name, fn in QUERIES.items():
        out[name] = fn(spark, sf_dir).schema
    return out


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
