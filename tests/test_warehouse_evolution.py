"""SCD2 / merge-upsert / connected-components operator unit tests."""

import datetime as dt

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.dedup import connected_components
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.merge import merge_upsert
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.scd import scd2_history


def test_scd2_windows_and_current_flag(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k1", t0, 10.0, 1),
        ("k1", t0 + dt.timedelta(days=1), 20.0, 2),
        ("k1", t0 + dt.timedelta(days=5), 30.0, 3),
        ("k2", t0, 99.0, 4),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, id long")
    out = {
        (r.k, r.v): r
        for r in scd2_history(df, "k", "ts", ["v"], tiebreak_col="id").collect()
    }
    assert out[("k1", 10.0)].valid_to == t0 + dt.timedelta(days=1)
    assert not out[("k1", 10.0)].is_current
    assert out[("k1", 30.0)].valid_to is None and out[("k1", 30.0)].is_current
    assert out[("k2", 99.0)].is_current


def test_scd2_simultaneous_changes_deterministic(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0, 1.0, 2), ("k", t0, 2.0, 1)]  # same ts, ids decide order
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, id long")
    out = sorted(
        scd2_history(df, "k", "ts", ["v"], tiebreak_col="id").collect(),
        key=lambda r: r.v,
    )
    # id=1 row (v=2.0) sorts first -> closed by id=2 row (v=1.0)
    assert out[1].valid_to == t0 and not out[1].is_current
    assert out[0].is_current


def test_merge_upsert_update_insert_untouched(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (9, "Z")], "k long, v string")
    got = {r.k: r.v for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}


def test_connected_components_chain_and_singleton_clique(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 iteration), clique 10-11, isolated
    # node never enters edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)], "src long, dst long"
    )
    got = {r.u: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_sublinear_rounds(spark):
    # a 64-node path is the adversarial case for min-label propagation
    # (diameter 63 → 63 rounds); large-star/small-star must collapse it
    # in O(log² n) — pin the bound so a regression back to propagation
    # (or a broken convergence probe) fails loudly
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    rounds: list[int] = []
    got = {
        r.u: r.label
        for r in connected_components(edges, rounds_out=rounds).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert rounds[0] <= 10, f"expected O(log^2 n) rounds, got {rounds[0]}"


def test_connected_components_two_components_and_reversed_ids(spark):
    # min-label must win regardless of edge orientation or insertion order
    edges = spark.createDataFrame(
        [(9, 3), (3, 7), (20, 25), (25, 21), (21, 20)], "src long, dst long"
    )
    got = {r.u: r.label for r in connected_components(edges).collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 21: 20, 25: 20}


def test_connected_components_rejects_non_integral_ids(spark):
    """String ids would cast to NULL and silently label nothing (review
    r4) — the operator must refuse them up front."""
    import pytest

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(TypeError, match="integral node ids"):
        connected_components(edges)


def test_connected_components_keeps_self_loop_only_nodes(spark):
    """A node appearing only in self-loop edges is still a node: it must
    come back labeled with itself, not vanish (review r4)."""
    edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "src long, dst long"
    )
    got = {r.u: r.label for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_connected_components_raises_when_budget_too_small(spark):
    """Exhausting max_iter before the fixpoint must raise, never return
    a partially contracted (silently wrong) labeling (review r4)."""
    import pytest

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(edges, max_iter=1)


def test_merge_upsert_dedups_updates_with_order_col(spark):
    """A CDC batch with several changes per key: order_col picks the
    highest-version row deterministically; without it the documented
    precondition is one row per key (review r4)."""
    base = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "k long, v string, ver long")
    ups = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (3, "z", 1)], "k long, v string, ver long"
    )
    got = {r.k: (r.v, r.ver) for r in merge_upsert(base, ups, ["k"], order_col="ver").collect()}
    assert got == {1: ("y", 2), 2: ("b", 0), 3: ("z", 1)}
