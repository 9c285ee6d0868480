"""Property-based tests (hypothesis) for the contract math (SURVEY §5.4).

Batched: hypothesis generates the case lists, Spark evaluates them in ONE
DataFrame pass per test (per-example Spark jobs would be prohibitively slow).
"""

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.functions import minutes_between, peak_band_id
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.transforms import quality_filters

_SPARK = None


def _get(spark_fixture=None):
    return _SPARK


def setup_module(module):
    global _SPARK
    from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark

    _SPARK = get_spark(app_name="engine-tests", cpus=8, shuffle_partitions=8)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.datetimes(
                min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2022, 1, 1)
            ),
            st.integers(min_value=0, max_value=200_000),  # seconds of duration
        ),
        min_size=1,
        max_size=50,
    )
)
def test_duration_matches_python_reference(cases):
    spark = _get()
    rows = [
        (i, p.replace(microsecond=0), p.replace(microsecond=0) + dt.timedelta(seconds=s))
        for i, (p, s) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, pickup timestamp, dropoff timestamp")
    got = {
        r.i: r.mins
        for r in df.select("i", minutes_between("pickup", "dropoff").alias("mins")).collect()
    }
    for i, (p, s) in enumerate(cases):
        assert got[i] == math.floor(s / 60)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1, max_value=8),
            st.floats(min_value=0.0, max_value=600.0, allow_nan=False),
            st.floats(min_value=-10.0, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_quality_filters_match_python_reference(cases):
    spark = _get()
    rows = [(i, p, d, f) for i, (p, d, f) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "i long, passenger_count int, trip_distance double, fare_amount double"
    )
    kept = {r.i for r in quality_filters(df).collect()}
    expected = {
        i
        for i, (p, d, f) in enumerate(cases)
        if 1 <= p <= 6 and 5.0 <= d <= 500.0 and f > 0
    }
    assert kept == expected


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=23), min_size=1, max_size=24))
def test_peak_band_matches_python_reference(hours):
    spark = _get()
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hours)], "i long, h int")
    got = {r.i: r.band for r in df.select("i", peak_band_id(F.col("h")).alias("band")).collect()}
    for i, h in enumerate(hours):
        if 0 <= h <= 5 or 20 <= h <= 23:
            exp = "101"
        elif 6 <= h <= 9 or 16 <= h <= 19:
            exp = "102"
        else:
            exp = "103"
        assert got[i] == exp
