"""Behavior contracts for extension batch X (queries_ext10)."""

import contextlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------- Q2 min-cost supplier

def test_min_cost_supplier_is_the_minimum(spark, sf_dir):
    rows = QUERIES["q_sql_min_cost_supplier"](spark, sf_dir).collect()
    assert rows
    # recompute each part's true min EUROPE cost independently
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    eu = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .filter("r_name = 'EUROPE'")
        .groupBy("l_partkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,4)")).alias("mn"))
    )
    mins = {r.l_partkey: float(r.mn) for r in eu.collect()}
    for r in rows:
        assert abs(r.supply_cost - mins[r.p_partkey]) < 1e-6


# ------------------------------------------------------------ Q6 forecast

def test_forecast_revenue_pushes_predicates_to_scan(spark, sf_dir):
    df = QUERIES["q_sql_forecast_revenue"](spark, sf_dir)
    assert df.collect()[0].revenue > 0
    plan = _plan(df)
    assert "PushedFilters" in plan
    # band predicates must reach the parquet scan, not sit above it
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


# ----------------------------------------------------------- Q9 profit

def test_product_profit_groups_unique_and_known_nations(spark, sf_dir):
    rows = QUERIES["q_sql_product_profit"](spark, sf_dir).collect()
    keys = [(r.nation, r.o_year) for r in rows]
    assert len(keys) == len(set(keys))
    nations = {
        r.n_name for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    assert {r.nation for r in rows} <= nations


# ------------------------------------------------------ Q11 important parts

def test_important_parts_beat_threshold(spark, sf_dir):
    rows = QUERIES["q_sql_important_parts"](spark, sf_dir).collect()
    assert rows
    total = sum(r.inv_value for r in rows)  # lower bound on corpus total
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    full_total = float(
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .filter("n_name = 'NATION_3'")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")))
        .collect()[0][0]
    )
    assert total <= full_total + 1e-6
    for r in rows:
        assert r.inv_value > 0.001 * full_total - 1e-6


# ----------------------------------------------------- Q16 supplier counts

def test_parts_supplier_cnt_descending_and_positive(spark, sf_dir):
    rows = QUERIES["q_sql_parts_supplier_cnt"](spark, sf_dir).collect()
    assert rows
    cnts = [r.supplier_cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(c >= 1 for c in cnts)
    assert all(r.p_type not in ("PROMO", "ECONOMY") for r in rows)


# ---------------------------------------------------- Q20 promo suppliers

def test_promo_suppliers_nation_restricted(spark, sf_dir):
    rows = QUERIES["q_sql_promo_suppliers"](spark, sf_dir).collect()
    assert all(r.n_name in ("NATION_5", "NATION_15") for r in rows)


# ---------------------------------------------------------- contamination

def test_contamination_counts_and_shares_consistent(spark, sf_dir):
    rows = QUERIES["q_contamination_check"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    non_bench = docs.filter("doc_id % 97 != 0").count()
    assert sum(r.n_docs for r in rows) == non_bench
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_docs
        assert r.contaminated_ppm == r.n_contaminated * 1_000_000 // r.n_docs


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    plan = _plan(QUERIES["q_contamination_check"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------- quality funnel

def test_quality_funnel_is_monotone(spark, sf_dir):
    rows = QUERIES["q_quality_filter_funnel"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert (
            r.n_docs >= r.pass_len >= r.pass_wordlen
            >= r.pass_stopword >= r.pass_ttr >= 0
        )
    # the synthetic corpus is clean English-ish text: the funnel should
    # not annihilate it
    assert sum(r.pass_ttr for r in rows) > 0
