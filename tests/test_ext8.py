"""Behavior contracts for extension batch VIII (queries_ext8)."""

import contextlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------- pareto share

def test_pareto_share_covers_80_percent(spark, sf_dir):
    rows = QUERIES["q_pareto_share"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_top80 <= r.n_cust
        # the flagged set must actually reach the 80% threshold
        assert r.top80_share >= 0.8
        # and not degenerate to "everyone" unless the segment is tiny
        if r.n_cust > 20:
            assert r.n_top80 < r.n_cust


# ---------------------------------------------------------------------- RFM

def test_rfm_scores_partition_customers(spark, sf_dir):
    rows = QUERIES["q_rfm_segmentation"](spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5


# ------------------------------------------------------------ price/volume

def test_bridge_effects_sum_to_revenue_delta(spark, sf_dir):
    rows = QUERIES["q_price_volume_bridge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        delta = r.rev_1997 - r.rev_1996
        assert abs((r.price_effect + r.volume_effect) - delta) < 0.05


def test_bridge_is_single_shuffle_with_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["q_price_volume_bridge"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # exactly one data exchange (the groupBy); broadcast exchanges excluded
    n_ex = plan.count("hashpartitioning(")
    assert n_ex == 1, plan


# ------------------------------------------------------------- nest/denest

def test_nest_orders_roundtrip_is_lossless(spark, sf_dir):
    nested = QUERIES["q_nest_orders"](spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        "l_orderkey % 50 = 0"
    )
    # denest: exploding the signature back yields exactly the source rows
    denested = nested.select(
        "l_orderkey",
        F.explode(F.split("items_sig", ",")).alias("item"),
    )
    assert denested.count() == li.count()
    # items are sorted by (ln, pk, qty) within each signature
    for r in nested.limit(50).collect():
        parts = [tuple(p.split(":")) for p in r.items_sig.split(",")]
        keyed = [(int(a), int(b), float(c)) for a, b, c in parts]
        assert keyed == sorted(keyed)
        assert r.n_items == len(keyed)


# ------------------------------------------------------------ snapshot diff

def test_snapshot_diff_counts_match_construction(spark, sf_dir):
    got = {
        r.change_type: r.n
        for r in QUERIES["q_snapshot_diff"](spark, sf_dir).collect()
    }
    keys = [
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey").collect()
    ]
    exp_removed = sum(1 for k in keys if k % 89 == 0)
    exp_added = sum(1 for k in keys if k % 101 == 0)
    exp_changed = sum(1 for k in keys if k % 89 != 0 and k % 97 == 0)
    assert got.get("removed", 0) == exp_removed
    assert got.get("added", 0) == exp_added
    assert got.get("changed", 0) == exp_changed
    assert got.get("unchanged", 0) == len(keys) - exp_removed - exp_changed


# ----------------------------------------------------------- inverted index

def test_inverted_index_postings_are_sorted_and_counted(spark, sf_dir):
    rows = QUERIES["q_inverted_index"](spark, sf_dir).collect()
    assert len(rows) == 20
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        ids = [int(x) for x in r.first_postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 10)
