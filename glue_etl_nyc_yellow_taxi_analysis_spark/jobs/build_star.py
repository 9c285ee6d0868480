"""Job 1 CLI — monthly star-schema build.

Drop-in replacement for the reference's Glue job
(``glue_job_scripts/etl-glue-nyc-yellow-data-model.py``): same parameters
(--SOURCE_RAW_FILE_PATH/--PROCESSED_YEAR/--PROCESSED_MONTH via argparse
instead of getResolvedOptions), same output contract (partitioned snappy
parquet star schema registered in the catalog).  Year/month default to
deriving from the filename, exactly what the trigger Lambda regexed out of
the S3 key.

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.build_star \
        --source /data/yellow_tripdata_2021-01.parquet \
        --database db_nyc_uber [--year 2021 --month 1] [--zone-csv path]
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from ..paths import year_month_from_path
from ..plans.star import run_monthly_build
from ..session import get_spark
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="monthly star-schema build")
    p.add_argument("--source", required=True, help="raw monthly trip parquet path")
    p.add_argument("--database", default="db_nyc_uber")
    p.add_argument("--year", default=None, help="processed_year (default: from filename)")
    p.add_argument("--month", default=None, help="processed_month (default: from filename)")
    p.add_argument("--zone-csv", default=None, help="taxi zone lookup CSV path")
    p.add_argument("--warehouse-dir", default=None, help="spark warehouse dir")
    p.add_argument(
        "--notify-jsonl",
        default=None,
        help="append a SUCCEEDED/FAILED terminal-state payload here "
        "(the SNS-email leg of the reference's EventBridge rule)",
    )
    args = p.parse_args(argv)

    year, month = args.year, args.month
    if year is None or month is None:
        year, month = year_month_from_path(args.source)
    # canonicalize to the unpadded partition values the filename regex
    # yields — '--month 01' must not create a second partition '01'
    # alongside '1' (review r4)
    year, month = str(int(year)), str(int(month))

    notifier = JobNotifier([stderr_sink])
    if args.notify_jsonl:
        notifier.add(jsonl_sink(args.notify_jsonl))

    def _run() -> dict:
        spark = get_spark(
            app_name="build-star", warehouse_dir=args.warehouse_dir, hive=True
        )
        run_monthly_build(
            spark,
            raw_path=args.source,
            database=args.database,
            processed_year=year,
            processed_month=month,
            zone_csv_path=args.zone_csv,
        )
        # count THE MONTH JUST BUILT via partition pruning — a bare
        # table count scans every month of history on each incremental
        # run and reports the total as if it were this month (review r4)
        n = (
            spark.table(f"{args.database}.fact_uber_trips")
            .filter(
                (F.col("processed_year") == year)
                & (F.col("processed_month") == month)
            )
            .count()
        )
        print(
            f"fact_uber_trips: {n} rows (database={args.database}, month={year}-{month})"
        )
        return {"fact_rows": n}

    run_with_notification(
        "build-star",
        _run,
        notifier,
        detail={"database": args.database, "year": year, "month": month},
    )


if __name__ == "__main__":
    main()
