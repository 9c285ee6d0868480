"""operators/prefix.running_sum — chunked two-phase prefix sums."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.prefix import running_sum


def test_running_sum_fixture(spark):
    rows = [("a", i, 1) for i in range(10)] + [("b", 5, 2), ("b", 9, 3)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    got = {
        (r.g, r.o): r.running
        for r in running_sum(df, "g", "o", "v", n_chunks=4).collect()
    }
    assert [got[("a", i)] for i in range(10)] == list(range(1, 11))
    assert got[("b", 5)] == 2 and got[("b", 9)] == 5


def test_running_sum_matches_naive_window(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("g"),  # 5 groups — the hazard case
        F.col("o_orderkey").alias("o"),
        F.col("o_custkey").alias("v"),
    )
    got = {
        (r.g, r.o): r.running
        for r in running_sum(ev, "g", "o", "v", n_chunks=16).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = ev.withColumn("running", F.sum("v").over(w)).collect()
    assert got == {(r.g, r.o): r.running for r in naive}


def test_running_sum_parallelism_is_group_times_chunk(spark, sf_dir):
    import contextlib
    import io

    ev = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderkey").alias("o"),
        F.col("o_custkey").alias("v"),
    )
    df = running_sum(ev, "g", "o", "v", n_chunks=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the fine window must partition by (g, chunk), not by g alone
    assert "_chk" in plan
