"""Behavior + plan contracts for extension batch IV (queries_ext4).

Cross-engine value equality is the oracle gate's job; these tests pin the
semantic invariants and physical-plan posture the oracle can't see:
bitmap distinct == exact distinct, salted == unsalted, sweep-line
concurrency on a constructed fixture, weighted-median threshold cases,
and no-Python-UDF / shuffle-count contracts.
"""

import contextlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    got = {
        r.event_type: r.n_users
        for r in QUERIES["q_bitmap_distinct"](spark, sf_dir).collect()
    }
    ev = QUERIES["q_dedup_exact"].__globals__["_t"](spark, sf_dir, "events")
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_salted_agg_equals_plain(spark, sf_dir):
    got = {
        r.l_returnflag: (r.n, r.sum_price, r.avg_price)
        for r in QUERIES["q_salted_agg"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # identical arithmetic, no salt — the pair must be bit-equal
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("_s"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round("_s", 2).cast("double").alias("sum_price"),
            F.round(F.col("_s").cast("double") / F.col("n"), 4).alias(
                "avg_price"
            ),
        )
        .collect()
    )
    assert got == {
        r.l_returnflag: (r.n, r.sum_price, r.avg_price) for r in plain
    }


def test_islands_fixture(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
            (1, "2024-01-05"),
            (2, "2024-02-10"),
        ],
        "user_id long, day string",
    ).select(
        (F.col("user_id") * 1000).alias("event_id"),
        F.col("day").cast("timestamp_ntz").alias("ts"),
        "user_id",
        F.lit("x").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext4 as x4

    orig = x4.__dict__["_t"]
    try:
        x4.__dict__["_t"] = lambda _s, _d, _n: df
        rows = {r.user_id: r for r in x4.q_islands_gaps(spark, "-").collect()}
    finally:
        x4.__dict__["_t"] = orig
    assert rows[1].n_streaks == 2
    assert rows[1].max_streak == 3
    assert str(rows[1].best_start) == "2024-01-01"
    assert rows[2].n_streaks == 1 and rows[2].max_streak == 1


def test_interval_overlap_fixture(spark):
    # three overlapping 30-min intervals at :00, :10, :20 → max 3;
    # a fourth at :50 only overlaps the :20 one → still 3
    ts = ["2024-01-01 00:00:00", "2024-01-01 00:10:00",
          "2024-01-01 00:20:00", "2024-01-01 00:50:00"]
    df = spark.createDataFrame(
        [(i, t, 1, "a", 1.0, "{}") for i, t in enumerate(ts)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    import glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext4 as x4

    orig = x4.__dict__["_t"]
    try:
        x4.__dict__["_t"] = lambda _s, _d, _n: df
        rows = x4.q_interval_overlap(spark, "-").collect()
    finally:
        x4.__dict__["_t"] = orig
    assert rows[0].max_concurrent == 3


def test_weighted_median_threshold(spark, sf_dir):
    # weighted median must sit where cumulative weight first reaches half
    # the total; verify against a driver-side recomputation per flag
    rows = QUERIES["q_weighted_stats"](spark, sf_dir).collect()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, r.l_quantity)
        )
    for r in rows:
        pairs = sorted(by_flag[r.l_returnflag])
        total = sum(q for _, q in pairs)
        cum = 0.0
        for price, q in pairs:
            cum += q
            if cum * 2 >= total:
                assert r.wmedian_price == price
                break


def test_weighted_median_operator_edges(spark):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.quantiles import (
        weighted_median,
    )

    rows = [
        # group a: values 1..4 weight 1 → cum 2*2>=4 at value 2
        ("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 1), ("a", 4.0, 1),
        # group b: all values equal (degenerate lo==hi bucket path)
        ("b", 7.0, 3), ("b", 7.0, 5),
        # group c: heavy tail — weight concentrated on the max value
        ("c", 1.0, 1), ("c", 100.0, 10),
        # group d: single row
        ("d", 42.0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long").select(
        "g", "v", F.col("w").cast("decimal(18,4)").alias("w")
    )
    got = {
        r.g: r.m
        for r in weighted_median(df, "g", "v", "w", out_col="m").collect()
    }
    assert got == {"a": 2.0, "b": 7.0, "c": 100.0, "d": 42.0}


def test_weighted_median_matches_naive_window(spark, sf_dir):
    from pyspark.sql import Window

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.quantiles import (
        weighted_median,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("g"),  # many groups, small each
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("decimal(18,4)").alias("w"),
    )
    got = {
        r.g: r.m for r in weighted_median(li, "g", "v", "w", out_col="m").collect()
    }
    w_cum = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        li.select(
            "g", "v",
            F.sum("w").over(w_cum).alias("cw"),
            F.sum("w").over(Window.partitionBy("g")).alias("tw"),
        )
        .filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .collect()
    )
    assert got == {r.g: r.m for r in naive}


def test_markov_probs_sum_to_one(spark, sf_dir):
    rows = QUERIES["q_markov_transitions"](spark, sf_dir).collect()
    by_prev = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    for total in by_prev.values():
        assert abs(total - 1.0) < 1e-4


def test_char_ngram_stays_jvm_side(spark, sf_dir):
    plan = _plan(QUERIES["q_char_ngram_profile"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # sequence+explode, not a UDF


def test_time_weighted_avg_plan_single_input_shuffle(spark, sf_dir):
    # the lead window and the final user_id aggregate must share one
    # hash-partitioning of the input (plus AQE reads) — no second wide
    # exchange of event rows
    plan = _plan(QUERIES["q_time_weighted_avg"](spark, sf_dir))
    assert plan.count("+- Exchange") == 1


def test_struct_ops_bounds(spark, sf_dir):
    rows = QUERIES["q_struct_ops"](spark, sf_dir).collect()
    for r in rows[:200]:
        assert r.first_qty <= r.max_qty
        assert r.max_qty_line <= r.last_line
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r.n_lines for r in rows) == li_n
