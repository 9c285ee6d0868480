"""Behavior + plan contracts for extension batch V (queries_ext5)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_text_roundtrip_matches_direct(spark, sf_dir):
    got = {
        r.event_type: (r.n, r.sum_id, r.n_users)
        for r in QUERIES["q_text_roundtrip"](spark, sf_dir).collect()
    }
    ev = QUERIES["q_bitmap_distinct"].__globals__["_t"](spark, sf_dir, "events")
    want = {
        r.event_type: (r.n, r.sum_id, r.n_users)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("sum_id"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .collect()
    }
    assert got == want


def test_csv_roundtrip_preserves_text_exactly(spark, sf_dir):
    rows = QUERIES["q_csv_roundtrip"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.source: (r.n_docs, r.sum_chars)
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
        .collect()
    }
    assert {r.source: (r.n_docs, r.sum_chars) for r in rows} == want


def test_math_battery_stays_jvm_side(spark, sf_dir):
    plan = _plan(QUERIES["q_math_battery"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trailing_range_fixture(spark):
    # events at 0s, 1800s, 3600s, 7201s: frame = trailing 3600s inclusive
    rows_ts = [0, 1800, 3600, 7201]
    df = spark.createDataFrame(
        [(i, t, 1, "a", 10.0, "{}") for i, t in enumerate(rows_ts)],
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.expr(
        "timestampadd(SECOND, CAST(ts AS INT), TIMESTAMP_NTZ '1970-01-01')"
    ))
    import glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext5 as x5

    orig = x5.__dict__["_t"]
    try:
        x5.__dict__["_t"] = lambda _s, _d, _n: df
        got = {
            r.event_id: (r.trailing_n, r.trailing_value)
            for r in x5.q_trailing_window_range(spark, "-").collect()
        }
    finally:
        x5.__dict__["_t"] = orig
    assert got == {
        0: (1, 10.0),
        1: (2, 20.0),
        2: (3, 30.0),   # 0s is exactly 3600 before → inclusive
        3: (1, 10.0),   # 3601..7201 contains only itself
    }


def test_pivot_dynamic_discovers_sorted_columns(spark, sf_dir):
    df = QUERIES["q_pivot_dynamic"](spark, sf_dir)
    assert df.columns == [
        "user_id", "click", "error", "purchase", "signup", "view",
    ]
    ev = QUERIES["q_bitmap_distinct"].__globals__["_t"](spark, sf_dir, "events")
    total = ev.count()
    rows = df.collect()
    assert sum(
        r.click + r.error + r.purchase + r.signup + r.view for r in rows
    ) == total


def test_stream_stateful_equals_batch(spark, sf_dir):
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in QUERIES["q_stream_stateful"](spark, sf_dir).collect()
    }
    ev = QUERIES["q_bitmap_distinct"].__globals__["_t"](spark, sf_dir, "events")
    want_rows = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("t")
    ).collect()
    assert set(got) == {r.user_id for r in want_rows}
    for r in want_rows:
        n, t = got[r.user_id]
        assert n == r.n
        # stateful total is rounded at each batch boundary; single-file
        # availableNow source → at most a few batches → cent-level agreement
        assert abs(t - r.t) < 0.05


def test_pagerank_is_a_distribution(spark, sf_dir):
    rows = QUERIES["q_pagerank"](spark, sf_dir).collect()
    assert len(rows) == 5
    total = sum(r.pagerank for r in rows)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r.pagerank > 0 for r in rows)


def test_pagerank_matches_power_iteration(spark, sf_dir):
    from pyspark.sql import Window

    ev = QUERIES["q_bitmap_distinct"].__globals__["_t"](spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    nodes = sorted({p.src for p in pairs} | {p.dst for p in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    out_tot = {}
    for p in pairs:
        out_tot[p.src] = out_tot.get(p.src, 0) + p.n
    import numpy as np

    m = np.zeros((len(nodes), len(nodes)))
    for p in pairs:
        m[idx[p.dst], idx[p.src]] = p.n / out_tot[p.src]
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(20):
        r = 0.15 / len(nodes) + 0.85 * (m @ r)
    got = {row.node: row.pagerank for row in
           QUERIES["q_pagerank"](spark, sf_dir).collect()}
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], abs=1e-6)
