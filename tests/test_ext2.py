"""Behavior + plan contracts for the extension-II batch (queries_ext2)."""

import io
import contextlib
import datetime as dt

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_gap_fill_calendar_is_dense(spark, sf_dir):
    rows = QUERIES["q_gap_fill"](spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.o_orderpriority, []).append(r)
    for key, series in by_key.items():
        days = sorted(r.day for r in series)
        # dense: every day between min and max present exactly once
        assert len(days) == (days[-1] - days[0]).days + 1, key
        assert len(set(days)) == len(days), key
        # forward fill: after the first non-null, revenue never goes null
        seen = False
        for r in sorted(series, key=lambda r: r.day):
            if r.ff_revenue is not None:
                seen = True
            elif seen:
                raise AssertionError(f"ff_revenue went null after fill: {key} {r.day}")


def test_funnel_stages_are_monotone(spark, sf_dir):
    r = QUERIES["q_funnel"](spark, sf_dir).collect()[0]
    assert r.n_view >= r.n_view_click >= r.n_view_click_purchase
    assert r.n_view > 0


def test_stratified_sample_rates(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    totals = {r.o_orderstatus: r.n for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    got = {
        r.o_orderstatus: r.n
        for r in QUERIES["q_stratified_sample"](spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # md5 is uniform: rates land near target (loose bounds, small samples)
    for status, target in (("O", 0.5), ("F", 0.25), ("P", 0.05)):
        if totals.get(status, 0) >= 100:
            rate = got.get(status, 0) / totals[status]
            assert abs(rate - target) < 0.12, (status, rate)
    # deterministic: same sample on re-run
    again = {
        r.o_orderstatus: r.n
        for r in QUERIES["q_stratified_sample"](spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == again


def test_incremental_agg_matches_full_recompute(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import dsum

    got = {
        (r.o_orderstatus, r.o_orderpriority): (r.n_orders, r.sum_price)
        for r in QUERIES["q_incremental_agg"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exp = {
        (r.o_orderstatus, r.o_orderpriority): (r.n, r.s)
        for r in o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("s"))
        .collect()
    }
    assert got == exp


def test_rolling_anomaly_values_exceed_band(spark, sf_dir):
    rows = QUERIES["q_rolling_anomaly"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.value - r.mu) > 2.0 * r.sd


def test_edit_distance_stays_blocked(spark, sf_dir):
    # plan contract: the brand blocking key must arrive as an equi-join
    # (hash-joinable), never a cartesian nested loop over all parts
    plan = _plan(QUERIES["q_edit_distance"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_month_zero_covers_all_customers(spark, sf_dir):
    rows = QUERIES["q_cohort_retention"](spark, sf_dir).collect()
    n_custs = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # every customer is active in their own cohort month (months_since=0)
    assert sum(r.n_active for r in rows if r.months_since == 0) == n_custs
