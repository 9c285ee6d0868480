"""Dimension builders — the star schema's 8 dimensions.

Static code/description dims come from the reference's "Requirement's Data
Contract" literals (DM:107-161); generated dims re-express the SQL
generators (DM:163-215) with DataFrame higher-order functions; the zone
lookup is a CSV scan (DM:220-228).

Engine fix (SURVEY §4 quirk 1): the reference's ``dim_trip_peak_band`` dict
literal has duplicated keys, collapsing the intended 3 rows to 1; here it
is the intended 3-row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import is_weekend
from ..sources.readers import from_rows, read_csv, sequence_dates, sequence_seconds

_CODE_SCHEMA = lambda id_name, desc_name: T.StructType(  # noqa: E731
    [
        T.StructField(id_name, T.StringType(), False),
        T.StructField(desc_name, T.StringType(), False),
    ]
)

# Data contract values (DM:108-161) — vendor/ratecode/flag/payment lookups.
VENDORS = [
    ("1", "Creative Mobile Technologies, LLC"),
    ("2", "Curb Mobility, LLC"),
    ("6", "Myle Technologies Inc"),
    ("7", "Helix"),
]
RATECODES = [
    ("1", "Standard rate"),
    ("2", "JFK"),
    ("3", "Newark"),
    ("4", "Nassau or Westchester"),
    ("5", "Negotiated fare"),
    ("6", "Group ride"),
    ("99", "Null/unknown"),
]
STORE_AND_FWD_FLAGS = [
    ("1", "store and forward trip"),
    ("0", "not a store and forward trip"),
]
PAYMENT_TYPES = [
    ("0", "Flex Fare trip"),
    ("1", "Credit card"),
    ("2", "Cash"),
    ("3", "No charge"),
    ("4", "Dispute"),
    ("5", "Unknown"),
    ("6", "Voided trip"),
]
# Intended 3-row peak-band dim (reference bug collapses it to 1 row).
TRIP_PEAK_BANDS = [
    ("101", "Night Hour"),
    ("102", "Peak Hour"),
    ("103", "Off-Peak"),
]


def dim_vendors(spark: SparkSession) -> DataFrame:
    return from_rows(spark, VENDORS, _CODE_SCHEMA("vendor_id", "vendor_name"))


def dim_ratecode(spark: SparkSession) -> DataFrame:
    return from_rows(spark, RATECODES, _CODE_SCHEMA("rate_code_id", "rate_code_description"))


def dim_store_and_fwd_flag(spark: SparkSession) -> DataFrame:
    return from_rows(
        spark,
        STORE_AND_FWD_FLAGS,
        _CODE_SCHEMA("store_and_fwd_flag_id", "store_and_fwd_flag_description"),
    )


def dim_payment_type(spark: SparkSession) -> DataFrame:
    return from_rows(
        spark, PAYMENT_TYPES, _CODE_SCHEMA("payment_type_id", "payment_type_description")
    )


def dim_trip_peak_band(spark: SparkSession) -> DataFrame:
    return from_rows(
        spark, TRIP_PEAK_BANDS, _CODE_SCHEMA("trip_peak_band_id", "trip_peak_band_description")
    )


def dim_date(
    spark: SparkSession, start: str = "2000-01-01", end: str = "2030-01-01"
) -> DataFrame:
    """Calendar dimension, 10 959 rows for the reference bounds (DM:163-182).

    Column semantics match the reference output, including its
    ``date``-column-overwritten-by-day-of-month quirk (SURVEY §4 quirk 2) —
    kept because the surrogate ``date_id`` join contract depends only on
    date_id, and downstream BI reads ``date`` as day-of-month per the ER
    diagram.
    """
    d = sequence_dates(spark, start, end)
    return d.withColumns(
        {
            "date_id": F.date_format("date", "yMMdd"),
            "date": F.date_format("date", "d"),
            "month": F.date_format("date", "M"),
            "year": F.date_format("date", "y"),
            "day_short": F.date_format("date", "E"),
            "day_long": F.date_format("date", "EEEE"),
            "month_short": F.date_format("date", "LLL"),
            "month_long": F.date_format("date", "LLLL"),
            "is_weekend": is_weekend("date"),
        }
    )


def dim_time(spark: SparkSession) -> DataFrame:
    """Time-of-day dimension, 86 400 rows (DM:201-215)."""
    t = sequence_seconds(spark)
    return t.select(
        F.date_format("ts", "HHmmss").alias("time_id"),
        F.date_format("ts", "H").alias("hour"),
        F.date_format("ts", "m").alias("minute"),
        F.date_format("ts", "s").alias("second"),
    )


def dim_taxi_zone_lookup(spark: SparkSession, csv_path: str) -> DataFrame:
    """Zone lookup from CSV with header (DM:220-228); all-string columns."""
    return read_csv(spark, csv_path, header=True)
