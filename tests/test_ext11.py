"""Behavior contracts for extension batch XI (queries_ext11)."""

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


# --------------------------------------------------------- python datasource

def test_python_datasource_partition_parallel(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_sensor")
        .option("n", "1000")
        .option("parts", "4")
        .load()
    )
    # the source's partitions() drives real input parallelism
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    # cell function is the documented LCG
    row = df.filter("seq = 7").collect()[0]
    assert row.reading == (7 * 1103515245 + 12345) % 1000
    assert row.device == 3


def test_python_datasource_rollup_complete(spark, sf_dir):
    rows = QUERIES["q_python_datasource"](spark, sf_dir).collect()
    assert len(rows) == 8
    assert sum(r.n for r in rows) == 10_000
    assert sum(r.seq_checksum for r in rows) == sum(range(10_000))


# --------------------------------------------------------- parameterized sql

def test_parameterized_sql_matches_literal_twin(spark, sf_dir):
    rows = {
        r.o_orderpriority: (r.n_orders, r.sum_price)
        for r in QUERIES["q_sql_parameterized"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lit = {
        r.o_orderpriority: (r.n, float(r.s))
        for r in o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
            & (F.col("o_orderstatus") == "F")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert rows == lit


def test_parameterized_sql_binds_not_concatenates(spark, sf_dir):
    # a value that would break the query if string-interpolated
    from glue_etl_nyc_yellow_taxi_analysis_spark.sql import register_views

    register_views(spark, sf_dir, tables=("orders",))
    rows = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :s",
        args={"s": "'; DROP TABLE orders; --"},
    ).collect()
    assert rows[0].n == 0  # matched nothing, executed safely


# ------------------------------------------------------- native session window

def test_session_window_native_matches_composed_sessionizer(spark, sf_dir):
    native = QUERIES["q_session_window_native"](spark, sf_dir)
    agg_n = native.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    ).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert agg_n.n_events == ev.count()

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import sessionize

    composed = sessionize.sessionize(
        ev.select("user_id", "ts", "value"), gap_minutes=30
    )
    assert composed.count() == agg_n.n_sessions


def test_session_window_spans_bounded_by_gap(spark, sf_dir):
    rows = QUERIES["q_session_window_native"](spark, sf_dir).collect()
    for r in rows[:50]:
        span = (r.session_end - r.session_start).total_seconds()
        assert span >= 30 * 60  # end includes the gap


# ----------------------------------------------------------- observed metrics

def test_observe_metrics_match_direct_aggregate(spark, sf_dir):
    row = QUERIES["q_observe_metrics"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("p"),
    ).collect()[0]
    assert row.n_rows == direct.n
    assert abs(row.min_value - direct.mn) < 1e-4
    assert abs(row.max_value - direct.mx) < 1e-4
    assert row.n_purchases == direct.p


def test_session_window_exact_gap_merges(spark):
    """Boundary pin: Spark's session_window MERGES an event landing exactly
    gap after its predecessor (the session extends while next_ts <=
    session_end); only a STRICTLY greater gap opens a new session — which
    is why the q_session_window_native / q_stream_sessions oracles use
    `> INTERVAL 30 MINUTE`.  A +1µs gap splits (second case)."""
    from pyspark.sql import functions as F

    def sessions(ts2):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (1, ts2)], "user_id long, ts_s string"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        out = (
            df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return sorted(r.n for r in out)

    assert sessions("2024-01-01 00:30:00") == [2]  # exact gap merges
    assert sessions("2024-01-01 00:30:00.000001") == [1, 1]  # +1µs splits
