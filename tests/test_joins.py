"""Join-operator unit tests: as-of semantics (ties, no-match, carry-forward)
and non-equi range join."""

import datetime as dt

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.joins import (
    asof_join,
    range_join_bands,
    semi_join,
    anti_join,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_backward_inclusive_and_carry(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(11)), (3, 1, _ts(12)), (4, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(11, 30)), (3, _ts(9))],
        "user_id long, ts timestamp",
    )
    got = {r.event_id: r.matched_ts for r in asof_join(left, right, on="user_id").collect()}
    assert got[1] == _ts(10)        # tie: right at same ts matches (inclusive)
    assert got[2] == _ts(10)        # carry-forward: no newer right yet
    assert got[3] == _ts(11, 30)    # latest prior right wins
    assert got[4] is None           # user 2 has no right rows → left-join null


def test_asof_value_columns(spark):
    left = spark.createDataFrame([(1, 1, _ts(12))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(11), "b")], "user_id long, ts timestamp, tag string"
    )
    row = asof_join(left, right, on="user_id", value_cols=["tag"]).collect()[0]
    assert row.right_tag == "b" and row.matched_ts == _ts(11)


def test_range_join_band_boundaries(spark):
    fact = spark.createDataFrame([(i,) for i in [0, 5, 6, 9, 10]], "v int")
    bands = spark.createDataFrame(
        [("lo_band", 0, 5), ("hi_band", 6, 9)], "band string, lo int, hi int"
    )
    got = {r.v: r.band for r in range_join_bands(fact, bands, "v").collect()}
    assert got == {0: "lo_band", 5: "lo_band", 6: "hi_band", 9: "hi_band"}  # 10 drops


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    assert {r.k for r in semi_join(left, right, "k").collect()} == {2, 3}
    assert {r.k for r in anti_join(left, right, "k").collect()} == {1}
