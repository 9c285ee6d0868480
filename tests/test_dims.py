"""Dimension builder tests (SURVEY §5.2: generated-dim row counts + values)."""

from glue_etl_nyc_yellow_taxi_analysis_spark.plans import dims


def test_static_dim_shapes(spark):
    assert dims.dim_vendors(spark).count() == 4
    assert dims.dim_ratecode(spark).count() == 7
    assert dims.dim_store_and_fwd_flag(spark).count() == 2
    assert dims.dim_payment_type(spark).count() == 7
    # engine fixes the reference's collapsed-dict bug: 3 rows, not 1
    bands = dims.dim_trip_peak_band(spark).collect()
    assert len(bands) == 3
    assert {r.trip_peak_band_id for r in bands} == {"101", "102", "103"}


def test_dim_date_contract(spark):
    d = dims.dim_date(spark)
    assert d.count() == 10_959  # 2000-01-01..2030-01-01 inclusive
    first = d.orderBy("date_id").first()
    assert first.date_id == "20000101"
    assert first.day_long == "Saturday"
    assert first.is_weekend == "Yes"
    assert first.date == "1"  # reference quirk: 'date' is day-of-month string
    assert first.month_long == "January"


def test_dim_time_contract(spark):
    t = dims.dim_time(spark)
    assert t.count() == 86_400
    rows = {r.time_id: r for r in t.filter("time_id in ('000000','235959')").collect()}
    assert rows["000000"].hour == "0"
    assert rows["235959"].hour == "23"
    assert rows["235959"].minute == "59"
    assert rows["235959"].second == "59"
