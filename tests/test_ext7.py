"""Behavior contracts for extension batch VII (queries_ext7)."""

import contextlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.indexing import global_index
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.skyline import skyline_2d
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- indexing

def test_global_index_is_contiguous_and_ordered(spark, sf_dir):
    rows = QUERIES["q_global_index"](spark, sf_dir).orderBy("idx").collect()
    assert [r.idx for r in rows] == list(range(1, len(rows) + 1))
    ids = [r.event_id for r in rows]
    assert ids == sorted(ids)


def test_global_index_avoids_single_partition_window(spark):
    # the plan must window over __bucket (many partitions), never an
    # empty PARTITION BY — that is the whole point of the operator
    df = global_index(
        spark.range(0, 10_000).withColumnRenamed("id", "k"), "k", buckets=8
    )
    plan = _plan(df)
    assert "__bucket" in plan  # window is keyed, not PARTITION BY ()
    out = df.orderBy("idx").collect()
    assert [r.idx for r in out] == list(range(1, 10_001))
    assert [r.k for r in out] == list(range(0, 10_000))


def test_global_index_skewed_input(spark):
    # clustered range + far outliers through few buckets
    df = spark.createDataFrame(
        [(i,) for i in range(100)] + [(1000 + i,) for i in range(5)], "k int"
    )
    out = global_index(df, "k", buckets=4).orderBy("idx").collect()
    assert [r.idx for r in out] == list(range(1, len(out) + 1))
    assert [r.k for r in out] == sorted(r.k for r in out)


def test_global_index_more_buckets_than_keys(spark):
    # quantile boundaries collapse onto the same values and must be
    # deduped before bucketing
    df = spark.createDataFrame([(i,) for i in range(3)], "k int")
    out = global_index(df, "k", buckets=8).orderBy("idx").collect()
    assert [(r.k, r.idx) for r in out] == [(0, 1), (1, 2), (2, 3)]


# ----------------------------------------------------------------- skyline

def test_skyline_matches_bruteforce(spark):
    pts = [(x, y) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    # frontier of the full grid is the single corner point
    assert got == {(5, 5)}

    staircase = [(0, 5), (1, 4), (2, 3), (3, 3), (4, 1), (2, 5)]
    df2 = spark.createDataFrame(staircase, "x int, y int")
    got2 = {(r.x, r.y) for r in skyline_2d(df2, "x", "y").collect()}
    # brute force dominance
    def dominated(p):
        return any(
            q[0] >= p[0] and q[1] >= p[1] and q != p for q in staircase
        )
    assert got2 == {p for p in set(staircase) if not dominated(p)}


def test_pareto_frontier_no_dominated_rows(spark, sf_dir):
    rows = QUERIES["q_pareto_frontier"](spark, sf_dir).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.o_orderpriority, []).append((r.price, r.odate))
    for pts in by_grp.values():
        for p in pts:
            assert not any(
                q[0] >= p[0] and q[1] >= p[1] and q != p for q in pts
            )


# ----------------------------------------------------------------- profile

def test_summary_stats_matches_spark_describe(spark, sf_dir):
    rows = {r.col_name: r for r in QUERIES["q_summary_stats"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = li.agg(
        F.count("l_quantity").alias("n"),
        F.mean("l_quantity").alias("m"),
        F.stddev_samp("l_quantity").alias("s"),
    ).first()
    got = rows["l_quantity"]
    assert got.n_cnt == ref.n
    assert abs(got.mean_v - ref.m) < 1e-4
    assert abs(got.std_v - ref.s) < 1e-3


def test_summary_stats_single_scan(spark, sf_dir):
    # one parquet scan feeds all 15 aggregates (explain('formatted')
    # prints each scan node twice: tree line + numbered detail block)
    plan = _plan(QUERIES["q_summary_stats"](spark, sf_dir))
    assert plan.count("Location: InMemoryFileIndex") == 1


# ---------------------------------------------------------------- checksum

def test_table_checksum_detects_single_cell_change(spark, sf_dir):
    base = QUERIES["q_table_checksum"](spark, sf_dir)
    totals = {r.o_orderpriority: r.checksum for r in base.collect()}
    # recompute with one value perturbed upstream: checksum must move
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    first_key = o.agg(F.min("o_orderkey")).first()[0]
    perturbed = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == first_key, F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice")),
    )
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    h = F.md5(canon)

    def a(i):
        return F.ascii(F.substring(h, i, 1)).cast("bigint")

    fold = ((a(1) * 256 + a(2)) * 256 + a(3)) * 256 + a(4)
    changed = {
        r.o_orderpriority: r.checksum
        for r in perturbed.withColumn("__f", fold)
        .groupBy("o_orderpriority")
        .agg(F.sum("__f").alias("checksum"))
        .collect()
    }
    diffs = [g for g in totals if totals[g] != changed[g]]
    assert len(diffs) == 1  # exactly the group holding the perturbed row


# -------------------------------------------------------------- resilience

def test_csv_malformed_keeps_all_rows(spark, sf_dir):
    rows = QUERIES["q_csv_malformed"](spark, sf_dir).collect()
    assert len(rows) == 6
    bad = [r for r in rows if r.is_bad]
    assert len(bad) == 2  # type-failure row + wrong-arity row
    # parseable fields of a partially-bad row survive
    partial = next(r for r in rows if r.id == 2)
    assert partial.val is None and partial.tag == "b" and partial.is_bad


def test_global_running_sum_matches_naive_window(spark):
    from pyspark.sql import Window

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.indexing import (
        global_running_sum,
    )

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    got = {
        r.k: r.running_sum
        for r in global_running_sum(df, "k", "v", buckets=8).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.rs for r in df.withColumn("rs", F.sum("v").over(w)).collect()}
    assert got == want
    # and the plan windows over __bucket, not a single empty partition
    plan = _plan(global_running_sum(df, "k", "v", buckets=8))
    assert "__bucket" in plan


def test_keyed_running_sum_matches_per_key_window(spark):
    """keyed_running_sum == the bare per-key window, on a corpus with a
    HOT key (70% of rows), order ties (same order value, tiebreak id),
    and several small keys — byte-identical per row."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.indexing import (
        keyed_running_sum,
    )

    rng = random.Random(7)
    rows = []
    for i in range(2000):
        # NULL key every 11th row: PARTITION BY treats NULL as its own
        # group, so the two-phase offset join must be null-safe (a
        # plain equi-join silently drops the whole NULL-key group —
        # the degenerate-corpus gate caught exactly that on adoption)
        key = (
            None
            if i % 11 == 0
            else ("hot" if i % 10 < 7 else f"k{i % 5}")
        )
        rows.append((key, i, rng.randint(0, 50), rng.randint(1, 9)))
    df = spark.createDataFrame(rows, "key string, id long, ord long, v long")

    got = {
        (r["key"], r["id"]): r["cum"]
        for r in keyed_running_sum(
            df, ["key"], "ord", "v", out_col="cum", buckets=8,
            tiebreak_cols=["id"],
        ).collect()
    }
    w = (
        Window.partitionBy("key")
        .orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["key"], r["id"]): r["cum"]
        for r in df.withColumn(
            "cum", F.sum("v").over(w).cast("bigint")
        ).collect()
    }
    assert got == want
    # and the plan partitions windows by (key, bucket), not bare key:
    # more than one task may carry the hot key
    plan_df = keyed_running_sum(
        df, ["key"], "ord", "v", buckets=8, tiebreak_cols=["id"]
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    assert "__bucket" in buf.getvalue()
