"""Lake-maintenance CLI — compaction + Z-order clustering + bucketed
catalog registration as one runnable job.

``curate_corpus`` is the content pipeline; this is the LAYOUT pipeline:
the periodic maintenance pass every 100 TB lake runs so reads stay cheap.
Pure composition of individually-proven operators (r5 verdict item 6):

  1. size audit      — input file count/bytes from a listing (no data read)
  2. compact+cluster — right-size the file count from on-disk bytes
                       (``layout.compact`` arithmetic), optionally Z-order
                       on the hot predicate columns first
                       (``layout.zorder_layout``) so every output file owns
                       a compact hyper-rectangle and footer min/max prunes
  3. verify          — row-count reconciliation in the card (maintenance
                       must be a no-op on the row bag)
  4. register        — optionally ``catalog.save_bucketed_table`` the
                       maintained data for shuffle-free co-located joins
  5. notify          — the terminal-state seam (SNS-email twin)

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.maintain_layout \\
        --source /lake/events --output /lake/events_v2 \\
        [--target-file-mb 128] [--zorder user_id,ts] \\
        [--bucket-table db.events --bucket-cols user_id --buckets 8] \\
        [--notify-jsonl state.jsonl]
"""

from __future__ import annotations

import argparse
import json
import math
import os

from ..operators import layout
from ..session import get_spark
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_parquet_files, total_bytes) from a listing — no data pages read."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def maintain(
    spark,
    source: str,
    output: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_cols: list[str] | None = None,
    bucket_table: str | None = None,
    bucket_cols: list[str] | None = None,
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> dict:
    """Run the maintenance pass; returns the accounting card."""
    files_in, bytes_in = _dir_stats(source)
    if files_in == 0:
        raise ValueError(f"no parquet files under {source!r}")
    df = spark.read.parquet(source)
    for c in zorder_cols or []:
        if c not in df.columns:
            raise ValueError(f"zorder column {c!r} not in {df.columns}")
    rows_in = df.count()

    if zorder_cols:
        # file count from the same bytes arithmetic layout.compact uses,
        # then cluster: range-partition on the morton key so each output
        # file owns a compact hyper-rectangle of the clustered columns
        n_files = max(1, math.ceil(bytes_in / target_file_bytes))
        clustered = layout.zorder_layout(df, zorder_cols, n_files).drop("__zkey")
        clustered.write.mode("overwrite").option(
            "compression", "snappy"
        ).parquet(output)
        files_out = _dir_stats(output)[0]
    else:
        files_out = layout.compact(
            spark, source, output, target_file_bytes=target_file_bytes
        )

    maintained = spark.read.parquet(output)
    rows_out = maintained.count()
    if rows_out != rows_in:
        raise RuntimeError(
            f"maintenance changed the row bag: {rows_in} in, {rows_out} out"
        )

    if bucket_table:
        from .. import catalog

        database, table = bucket_table.split(".", 1)
        catalog.ensure_database(spark, database)
        catalog.save_bucketed_table(
            maintained,
            database,
            table,
            bucket_cols=bucket_cols or [],
            num_buckets=num_buckets,
            sort_cols=sort_cols,
        )

    _, bytes_out = _dir_stats(output)
    card = {
        "rows": rows_in,
        "files_in": files_in,
        "files_out": files_out,
        "bytes_in": bytes_in,
        "bytes_out": bytes_out,
        "zorder_cols": zorder_cols or [],
        "bucket_table": bucket_table,
    }
    print("layout card: " + json.dumps(card, sort_keys=True))
    return card


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="lake layout maintenance")
    p.add_argument("--source", required=True, help="parquet dir to maintain")
    p.add_argument("--output", required=True, help="maintained output dir")
    p.add_argument(
        "--target-file-mb", type=int, default=128, help="target file size (MiB)"
    )
    p.add_argument(
        "--zorder", default=None, help="comma-separated columns to Z-order on"
    )
    p.add_argument(
        "--bucket-table",
        default=None,
        help="db.table to register the maintained data as a bucketed table",
    )
    p.add_argument(
        "--bucket-cols", default=None, help="comma-separated bucket columns"
    )
    p.add_argument("--buckets", type=int, default=8, help="bucket count")
    p.add_argument(
        "--sort-cols", default=None, help="comma-separated in-bucket sort columns"
    )
    p.add_argument(
        "--notify-jsonl",
        default=None,
        help="append a SUCCEEDED/FAILED terminal-state payload here",
    )
    args = p.parse_args(argv)
    if args.bucket_table and not args.bucket_cols:
        p.error("--bucket-table requires --bucket-cols")

    notifier = JobNotifier([stderr_sink])
    if args.notify_jsonl:
        notifier.add(jsonl_sink(args.notify_jsonl))

    def _run() -> dict:
        spark = get_spark(app_name="maintain-layout")
        return maintain(
            spark,
            args.source,
            args.output,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
            zorder_cols=args.zorder.split(",") if args.zorder else None,
            bucket_table=args.bucket_table,
            bucket_cols=args.bucket_cols.split(",") if args.bucket_cols else None,
            num_buckets=args.buckets,
            sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
        )

    run_with_notification(
        "maintain-layout",
        _run,
        notifier,
        detail={"source": args.source, "output": args.output},
    )


if __name__ == "__main__":
    main()
