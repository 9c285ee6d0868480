"""Job 2 CLI — star schema → warehouse load.

Drop-in replacement for the reference's second Glue job
(``glue_job_scripts/etl-glue-load-to-postgres.py``): dimensions are created
if missing, the requested fact month is appended with partition pruning.
With ``--jdbc-url`` it loads over JDBC (requires a driver jar on the Spark
classpath, exactly like the reference's --extra-jars postgres driver);
without, it loads into a parquet-directory warehouse.

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.load_warehouse \
        --database db_nyc_uber --year 2021 --month 1 \
        [--jdbc-url jdbc:postgresql://... --jdbc-user u --jdbc-password p] \
        [--warehouse-path /data/warehouse]
"""

from __future__ import annotations

import argparse

from ..plans.warehouse import load_star_to_warehouse
from ..session import get_spark
from ..sources.writers import JdbcWarehouse, ParquetWarehouse
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="star schema -> warehouse load")
    p.add_argument("--database", default="db_nyc_uber")
    p.add_argument("--year", required=True)
    p.add_argument("--month", required=True)
    p.add_argument("--jdbc-url", default=None)
    p.add_argument("--jdbc-user", default=None)
    p.add_argument("--jdbc-password", default=None)
    p.add_argument("--jdbc-driver", default="org.postgresql.Driver")
    p.add_argument("--warehouse-path", default="./warehouse")
    p.add_argument("--warehouse-dir", default=None, help="spark warehouse dir")
    p.add_argument(
        "--notify-jsonl",
        default=None,
        help="append a SUCCEEDED/FAILED terminal-state payload here "
        "(the SNS-email leg of the reference's EventBridge rule)",
    )
    args = p.parse_args(argv)

    # canonicalize: fact partitions are written with UNPADDED values
    # ('1', not '01' — paths.year_month_from_path strips the pad), so a
    # zero-padded --month would silently filter zero fact rows and
    # notify SUCCEEDED on an empty load (review r4)
    year, month = str(int(args.year)), str(int(args.month))

    notifier = JobNotifier([stderr_sink])
    if args.notify_jsonl:
        notifier.add(jsonl_sink(args.notify_jsonl))

    def _run() -> dict:
        spark = get_spark(
            app_name="load-warehouse", warehouse_dir=args.warehouse_dir, hive=True
        )
        if args.jdbc_url:
            props = {"driver": args.jdbc_driver}
            # user and password attach independently: the user may live
            # in the URL while the password comes via the flag (review r4)
            if args.jdbc_user:
                props["user"] = args.jdbc_user
            if args.jdbc_password is not None:
                props["password"] = args.jdbc_password
            wh = JdbcWarehouse(spark, args.jdbc_url, props)
        else:
            wh = ParquetWarehouse(args.warehouse_path)
        actions = load_star_to_warehouse(spark, wh, args.database, year, month)
        for table, action in sorted(actions.items()):
            print(f"{table}: {action}")
        return {k: str(v) for k, v in sorted(actions.items())}

    run_with_notification(
        "load-warehouse",
        _run,
        notifier,
        detail={"database": args.database, "year": year, "month": month},
    )


if __name__ == "__main__":
    main()
