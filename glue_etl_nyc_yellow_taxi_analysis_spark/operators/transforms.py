"""Row-transform operator library (SURVEY §2.2 P1-P7, §2.3 F1-F5, §2.5 D1).

Implements the reference's fact data contract as composable DataFrame
transforms.  Contract source: the cast map at
``glue_job_scripts/etl-glue-nyc-yellow-data-model.py:243-269``, rename map
at ``:234-241``, quality filters at ``:271-277, 301``.

Engine decisions vs the reference (SURVEY §4 quirks):
- timestamps stay ``TimestampType`` end-to-end (no string round-trip);
  string formatting happens only at sinks that require it (quirk 3).
- ``tolls_amount`` is explicitly cast to float instead of silently riding
  through as source double (quirk 6) — behind ``normalize_tolls``.
- the hour-band join is a pure column function (functions.peak_band_id), not
  a runtime distinct()-derived lookup (SURVEY §4(b)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import minutes_between, uuid_pk, yn_flag

# P1 — bulk rename: raw NYC TLC names → engine snake_case (DM:234-241).
RENAME_MAP = {
    "VendorID": "vendor_id",
    "RatecodeID": "rate_code_id",
    "PULocationID": "pickup_location_id",
    "DOLocationID": "drop_off_location_id",
}

# Quality-filter bounds — these ARE the fact contract (SURVEY §4 quirk 5).
PASSENGER_BOUNDS = (1, 6)
DISTANCE_BOUNDS = (5.0, 500.0)
MAX_DURATION_MINUTES = 1440


def rename_raw_columns(df: DataFrame) -> DataFrame:
    """P1 — bulk rename via one withColumnsRenamed (no per-column plans)."""
    present = {k: v for k, v in RENAME_MAP.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def cast_contract(df: DataFrame, normalize_tolls: bool = True) -> DataFrame:
    """P2/X6 — the 18-column cast-and-recode map (DM:243-269).

    One ``withColumns`` call → one Project node; Catalyst collapses it with
    neighbouring projections.  Timestamps keep their type (engine decision).
    """
    casts: dict[str, Column] = {
        "vendor_id": F.col("vendor_id").cast(T.IntegerType()),
        "passenger_count": F.col("passenger_count").cast(T.IntegerType()),
        "trip_distance": F.col("trip_distance").cast(T.FloatType()),
        "rate_code_id": F.col("rate_code_id").cast(T.IntegerType()),
        "store_and_fwd_flag": yn_flag("store_and_fwd_flag"),
        "pickup_location_id": F.col("pickup_location_id").cast(T.IntegerType()),
        "drop_off_location_id": F.col("drop_off_location_id").cast(T.IntegerType()),
        "payment_type": F.col("payment_type").cast(T.IntegerType()),
        "fare_amount": F.col("fare_amount").cast(T.FloatType()),
        "extra": F.col("extra").cast(T.FloatType()),
        "mta_tax": F.col("mta_tax").cast(T.FloatType()),
        "tip_amount": F.col("tip_amount").cast(T.FloatType()),
        "improvement_surcharge": F.col("improvement_surcharge").cast(T.FloatType()),
        "total_amount": F.col("total_amount").cast(T.DecimalType(10, 2)),
        "congestion_surcharge": F.col("congestion_surcharge").cast(T.FloatType()),
        "airport_fee": F.coalesce(F.col("airport_fee").cast(T.FloatType()), F.lit(0.0)),
    }
    if normalize_tolls and "tolls_amount" in df.columns:
        casts["tolls_amount"] = F.col("tolls_amount").cast(T.FloatType())
    present = {k: v for k, v in casts.items() if k in df.columns}
    return df.withColumns(present)


def quality_filters(df: DataFrame) -> DataFrame:
    """F1/F2 — contract filters: passengers 1-6, distance 5-500, fare>0
    (DM:273-277).  Expressed declaratively so Catalyst merges them into one
    predicate and pushes what it can into the scan.
    """
    lo_p, hi_p = PASSENGER_BOUNDS
    lo_d, hi_d = DISTANCE_BOUNDS
    return (
        df.filter((F.col("passenger_count") >= lo_p) & (F.col("passenger_count") <= hi_p))
        .filter((F.col("trip_distance") >= lo_d) & (F.col("trip_distance") <= hi_d))
        .filter("fare_amount > 0")
    )


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """D1 — full-row (or keyed) exact dedup (DM:271).

    ``dropDuplicates`` compiles to a hash aggregate over all columns — one
    shuffle on the dedup key.  At scale prefer a keyed subset (shuffles only
    the key columns' hash) or pre-partitioned input.
    """
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def with_surrogate_keys(
    df: DataFrame,
    pickup_col: str = "tpep_pickup_datetime",
    dropoff_col: str = "tpep_dropoff_datetime",
) -> DataFrame:
    """P2/X1 — 4 surrogate key columns from the two timestamps (DM:281-288)."""
    return df.withColumns(
        {
            "tpep_pickup_date_id": F.date_format(pickup_col, "yyyyMMdd"),
            "tpep_pickup_time_id": F.date_format(pickup_col, "HHmmss"),
            "tpep_dropoff_date_id": F.date_format(dropoff_col, "yyyyMMdd"),
            "tpep_dropoff_time_id": F.date_format(dropoff_col, "HHmmss"),
        }
    )


def with_duration(
    df: DataFrame,
    pickup_col: str = "tpep_pickup_datetime",
    dropoff_col: str = "tpep_dropoff_datetime",
) -> DataFrame:
    """P3/X8-X10 + F3 — whole-minute duration, filtered < 24h (DM:290-301)."""
    df = df.withColumn("trip_duration_minutes", minutes_between(pickup_col, dropoff_col))
    return df.filter(F.col("trip_duration_minutes") < MAX_DURATION_MINUTES)


def with_uuid_pk(df: DataFrame, name: str = "trip_id") -> DataFrame:
    """P3/X7 — non-deterministic uuid surrogate PK (DM:279).

    Must be added AFTER filters: Catalyst will not push predicates through a
    non-deterministic projection (SURVEY §4(a)).
    """
    return df.withColumn(name, uuid_pk())
