"""Behavior contracts for extension batch VI (queries_ext6)."""

import contextlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bag_semantics_pairwise(spark):
    # a = {x, x, y}, b = {x}: INTERSECT ALL keeps ONE x (pairwise match),
    # EXCEPT ALL keeps the unmatched x and the y — distinct variants would
    # lose the duplicate entirely
    a = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    b = spark.createDataFrame([("x",)], "v string")
    assert sorted(r.v for r in a.intersectAll(b).collect()) == ["x"]
    assert sorted(r.v for r in a.exceptAll(b).collect()) == ["x", "y"]


def test_set_ops_all_counts_are_bag_counts(spark, sf_dir):
    rows = QUERIES["q_set_ops_all"](spark, sf_dir).collect()
    assert all(r.n >= 1 for r in rows)
    ops = {r.op for r in rows}
    assert ops <= {"intersect_all", "except_all"}


def test_union_mixed_schema_nullfills_by_name(spark, sf_dir):
    rows = QUERIES["q_union_mixed_schema"](spark, sf_dir).collect()
    groups = {r.priority_code for r in rows}
    assert None in groups  # the old slice surfaces as the NULL group
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r.n for r in rows) == o.count()


def test_schema_evolution_nulls_exactly_v1_rows(spark, sf_dir):
    rows = {r.event_type: r for r in
            QUERIES["q_schema_evolution"](spark, sf_dir).collect()}
    for t, r in rows.items():
        if t in ("click", "view"):
            assert r.n_null == r.n and r.sum_v2 is None
        else:
            assert r.n_null == 0 and r.sum_v2 is not None


def test_binary_funcs_stay_jvm_side(spark, sf_dir):
    df = QUERIES["q_binary_funcs"](spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    r = df.orderBy("doc_id").first()
    assert len(r.md5_hex) == 32 and len(r.sha256_hex) == 64
