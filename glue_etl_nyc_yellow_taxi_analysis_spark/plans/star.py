"""The star-schema fact build — Job-1 semantics as one composed plan.

Re-expresses the reference fact pipeline (DM:232-371): scan → rename → cast
contract → dedup → quality filters → uuid PK → surrogate keys → duration →
peak band → final 26-column projection → partitioned snappy write +
catalog registration.

Differences (all documented SURVEY §4 engine decisions):
- timestamps stay TimestampType until the final projection;
- the hour→band mapping is a pure column expression instead of a
  distinct()-over-the-fact derived join (one less fact scan, no join);
- ``tolls_amount`` cast to float (normalized).

Scale posture: the only wide operation in the whole plan is the
``dropDuplicates`` shuffle; everything else is narrow (scan/project/filter)
and the write is partitioned by (processed_year, processed_month) so each
monthly run touches exactly one partition directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import create_table_if_not_exists, ensure_database, save_table
from ..functions import peak_band_id
from ..operators.transforms import (
    cast_contract,
    dedup_exact,
    quality_filters,
    rename_raw_columns,
    with_duration,
    with_surrogate_keys,
    with_uuid_pk,
)
from . import dims

FACT_COLUMNS = [
    "trip_id",
    "vendor_id",
    "passenger_count",
    "tpep_pickup_date_id",
    "tpep_pickup_time_id",
    "tpep_dropoff_date_id",
    "tpep_dropoff_time_id",
    "trip_duration_minutes",
    "trip_peak_band_id",
    "trip_distance",
    "rate_code_id",
    "store_and_fwd_flag",
    "pickup_location_id",
    "drop_off_location_id",
    "payment_type",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
    "airport_fee",
    "total_amount",
    "processed_year",
    "processed_month",
]


def build_fact(
    raw: DataFrame,
    processed_year: str,
    processed_month: str,
    reference_compat: bool = False,
) -> DataFrame:
    """Raw monthly trip DataFrame → fact_uber_trips rows (lazy plan).

    ``reference_compat=True`` reproduces the reference's quirks byte-for-
    byte where they reach the output (SURVEY §4): tolls_amount rides
    through as source double instead of the normalized float cast (quirk
    6).  The other quirks (string-typed intermediate timestamps, the
    distinct()-derived band join) do not change output values — the engine
    form is used unconditionally.
    """
    df = rename_raw_columns(raw)
    df = cast_contract(df, normalize_tolls=not reference_compat)
    df = dedup_exact(df)
    df = quality_filters(df)
    df = with_duration(df)
    df = with_uuid_pk(df)
    df = with_surrogate_keys(df)
    df = df.withColumn(
        "trip_peak_band_id", peak_band_id(F.hour("tpep_pickup_datetime"))
    )
    df = df.withColumns(
        {
            "processed_year": F.lit(processed_year),
            "processed_month": F.lit(processed_month),
        }
    )
    return df.select(*FACT_COLUMNS)


def ensure_dimensions(
    spark: SparkSession, database: str, zone_csv_path: str | None = None
) -> None:
    """Create-if-not-exists for all 8 dimensions (idempotent re-runs)."""
    ensure_database(spark, database)
    builders = {
        "dim_vendors": dims.dim_vendors,
        "dim_ratecode": dims.dim_ratecode,
        "dim_store_and_fwd_flag": dims.dim_store_and_fwd_flag,
        "dim_payment_type": dims.dim_payment_type,
        "dim_trip_peak_band": dims.dim_trip_peak_band,
        "dim_date": dims.dim_date,
        "dim_time": dims.dim_time,
    }
    for name, build in builders.items():
        create_table_if_not_exists(spark, build(spark), database, name)
    if zone_csv_path:
        create_table_if_not_exists(
            spark, dims.dim_taxi_zone_lookup(spark, zone_csv_path), database,
            "dim_taxi_zone_lookup",
        )


def run_monthly_build(
    spark: SparkSession,
    raw_path: str,
    database: str,
    processed_year: str,
    processed_month: str,
    zone_csv_path: str | None = None,
) -> None:
    """Full Job-1 equivalent: ensure dims, build fact, partitioned write.

    Dynamic partition overwrite: re-running a month replaces exactly that
    month's partition — idempotent incremental ingest without truncating
    history (the reference relies on Glue catalog update semantics for the
    same property).
    """
    ensure_dimensions(spark, database, zone_csv_path)
    raw = spark.read.parquet(raw_path)
    fact = build_fact(raw, processed_year, processed_month)
    # dynamic partition overwrite is scoped inside catalog.save_table
    save_table(
        fact,
        database,
        "fact_uber_trips",
        partition_by=["processed_year", "processed_month"],
        mode="overwrite",
    )
