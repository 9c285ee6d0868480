"""Session-timezone independence.

The external driver runs the declared queries in a VANILLA SparkSession —
whatever timezone the host happens to be in.  Every time-touching query
therefore converts event timestamps to TIMESTAMP_NTZ (naive wall-clock)
before any date_format / window / diff — these tests pin that contract by
running the same query under UTC and a DST-shifting zone and demanding
row-identical results.
"""

import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES

TZ_SENSITIVE = [
    "q_derived_columns",
    "q_event_sessionize",
    "q_sliding_windows",
    "q_time_weighted_avg",
    "q_islands_gaps",
    "q_trailing_window_range",
    "q_date_trunc",
    "q_interval_overlap",
    "q_session_windows",
    "q_moving_avg",
    "q_cohort_retention",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_results_identical_across_session_timezones(spark, sf_dir, name):
    key = "spark.sql.session.timeZone"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "UTC")
        utc = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
        spark.conf.set(key, "America/New_York")
        nyc = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
    finally:
        spark.conf.set(key, orig)
    assert utc == nyc
