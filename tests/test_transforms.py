"""Unit tests for the fact transform contract (SURVEY §5.2/§5.4)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from glue_etl_nyc_yellow_taxi_analysis_spark.functions import (
    minutes_between,
    peak_band_id,
    yn_flag,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.transforms import (
    cast_contract,
    dedup_exact,
    quality_filters,
    rename_raw_columns,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.paths import year_month_from_path


def test_rename_map(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], ["VendorID", "RatecodeID", "PULocationID", "DOLocationID"]
    )
    out = rename_raw_columns(df)
    assert out.columns == [
        "vendor_id",
        "rate_code_id",
        "pickup_location_id",
        "drop_off_location_id",
    ]


def test_cast_contract_types_and_recodes(spark):
    df = spark.createDataFrame(
        [
            (1.0, "Y", 10.0, None),
            (2.0, "N", 20.0, 1.25),
            (3.0, None, 30.0, None),
        ],
        T.StructType(
            [
                T.StructField("passenger_count", T.DoubleType()),
                T.StructField("store_and_fwd_flag", T.StringType()),
                T.StructField("fare_amount", T.DoubleType()),
                T.StructField("airport_fee", T.DoubleType()),
            ]
        ),
    )
    out = cast_contract(df)
    rows = out.orderBy("passenger_count").collect()
    assert dict(out.dtypes)["passenger_count"] == "int"
    assert dict(out.dtypes)["fare_amount"] == "float"
    # Y→1, N→0, null→0
    assert [r.store_and_fwd_flag for r in rows] == [1, 0, 0]
    # null airport_fee coalesced to 0.0
    assert [r.airport_fee for r in rows] == [0.0, 1.25, 0.0]


def test_quality_filter_boundaries(spark):
    rows = [
        (0, 10.0, 5.0),   # pax below
        (1, 10.0, 5.0),   # keep (lower bounds inclusive)
        (6, 10.0, 5.0),   # keep
        (7, 10.0, 5.0),   # pax above
        (1, 4.99, 5.0),   # distance below
        (1, 500.0, 5.0),  # keep (upper bound inclusive)
        (1, 500.01, 5.0), # distance above
        (1, 10.0, 0.0),   # fare not > 0
        (1, 10.0, -1.0),  # negative fare
    ]
    df = spark.createDataFrame(rows, "passenger_count int, trip_distance double, fare_amount double")
    kept = quality_filters(df).collect()
    assert len(kept) == 3


def test_dedup_exact_full_row(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    assert dedup_exact(df).count() == 2


def test_duration_and_peak_band(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2021, 1, 1, 7, 0, 0), dt.datetime(2021, 1, 1, 7, 30, 30)),
            (dt.datetime(2021, 1, 1, 23, 0, 0), dt.datetime(2021, 1, 2, 0, 15, 0)),
        ],
        "pickup timestamp, dropoff timestamp",
    )
    out = df.select(
        minutes_between("pickup", "dropoff").alias("mins"),
        peak_band_id(F.hour("pickup")).alias("band"),
    ).collect()
    assert [r.mins for r in out] == [30, 75]  # floor(30.5) = 30
    assert [r.band for r in out] == ["102", "101"]


def test_peak_band_full_day(spark):
    df = spark.createDataFrame([(h,) for h in range(24)], "h int")
    got = {r.h: r.band for r in df.select("h", peak_band_id(F.col("h")).alias("band")).collect()}
    for h in list(range(0, 6)) + list(range(20, 24)):
        assert got[h] == "101", h
    for h in list(range(6, 10)) + list(range(16, 20)):
        assert got[h] == "102", h
    for h in list(range(10, 16)):
        assert got[h] == "103", h


def test_year_month_from_path():
    assert year_month_from_path("s3://b/fact/yellow_tripdata_2021-01.parquet") == ("2021", "1")
    assert year_month_from_path("/x/yellow_tripdata_2023-12.parquet") == ("2023", "12")
