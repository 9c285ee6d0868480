"""Storage-layout & maintenance operators — multi-dimensional clustering,
small-file compaction, and footer-level statistics.

At 100 TB the dominant cost is how much of the lake a query has to READ;
these operators shape the data so parquet footer min/max stats prune it:

- ``morton_code`` / ``zorder_layout`` — Z-order (bit-interleaved)
  clustering: range predicates on ANY of the clustered columns prune
  files, not just the leading sort key (the multi-dimensional
  generalization of ``partitioning.range_partition_sorted``).
- ``compact`` — rewrite a directory of too-many-small-files into
  right-sized files (small files are the classic lake failure mode:
  footer overhead + task-per-file scheduling).
- ``file_stats`` — per-file row counts and column min/max straight from
  parquet footers (no data read): the evidence for layout decisions and
  the test hook for clustering quality.
- ``pruned_read`` — the consumer of those stats: a zone-map pruned scan
  that reads only the files whose footer range overlaps the predicate
  (file-granularity data skipping, the manifest-pruning move of
  Iceberg/Delta re-expressed over a plain parquet directory).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketize(col: Column, mn: Column, mx: Column, buckets: int) -> Column:
    """Map a value into ``[0, buckets)`` by uniform min/max scaling.

    FLOOR before the int cast — plain double→int casts are not portable
    (some engines truncate, some round); floor-then-cast is exact
    everywhere.  Degenerate span (mn == mx) maps to bucket 0.
    """
    span = mx - mn
    raw = F.floor((col - mn) / span * buckets).cast("int")
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    )


def morton_code(bucket_cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative int) column
    into one Z-order key: bit ``b`` of column ``i`` lands at position
    ``b * ncols + i``.  Pure integer shift/mask expressions — JVM
    codegen'd, and bit-identical in any engine with ``& >> <<`` (the
    DuckDB oracle for ``q_zorder_code`` runs the same arithmetic).
    """
    ncols = len(bucket_cols)
    out = F.lit(0).cast("long")
    for i, c in enumerate(bucket_cols):
        c = c.cast("long")
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
    return out


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 8,
    key_col: str = "__zkey",
) -> DataFrame:
    """Cluster ``df`` on the Z-order key of ``cols``: bucketize each column
    against its global min/max (one tiny agg, broadcast back), interleave
    bits, then range-partition + sort on the key so every output file owns
    a compact hyper-rectangle of the value space.

    Write the result with ``df.write.parquet``: footer min/max on EVERY
    clustered column is then narrow per file, so predicates on any of them
    prune files — a linear sort only achieves that for its leading key.
    One extra shuffle versus a plain write; at 100 TB that is the trade:
    pay one shuffle at write time, skip most of the lake at read time.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    buckets = [
        bucketize(
            F.col(c).cast("double"),
            F.col(f"__mn_{c}"),
            F.col(f"__mx_{c}"),
            2**bits,
        )
        for c in cols
    ]
    keyed = with_bounds.withColumn(key_col, morton_code(buckets, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    return keyed.repartitionByRange(num_partitions, key_col).sortWithinPartitions(
        key_col
    )


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` (a parquet directory of many small files) into
    ``out_path`` with files sized ~``target_file_bytes``; returns the output
    file count.  File count is derived from the INPUT's on-disk bytes (a
    listing, no data read), then a narrow ``coalesce`` — no shuffle; rows
    within surviving partitions keep their order.

    Local/posix listing here; on a real lake the same arithmetic runs over
    the FileSystem listing (or the table format's manifest).  Compaction is
    maintenance, not transformation: the row bag is unchanged
    (exceptAll-both-ways empty, asserted in tests).
    """
    total = 0
    for root, _dirs, files in os.walk(in_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    written = 0
    for root, _dirs, files in os.walk(out_path):
        written += sum(1 for f in files if f.endswith(".parquet"))
    return written


def file_stats(path: str, cols: list[str]):
    """Per-file footer statistics: rows + min/max for ``cols``, straight
    from parquet metadata (zero data pages read).  Returns a list of dicts
    — small (one per file), meant for driver-side layout decisions and
    tests, not for joining against the fact.
    """
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for fname in sorted(files):
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(root, fname)
            md = pq.ParquetFile(fpath).metadata
            stat = {"file": fname, "rows": md.num_rows}
            stat["path"] = fpath
            for c in cols:
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    rgm = md.row_group(rg)
                    for ci in range(rgm.num_columns):
                        col = rgm.column(ci)
                        if col.path_in_schema == c and col.statistics is not None:
                            s = col.statistics
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
                stat[f"{c}_min"], stat[f"{c}_max"] = lo, hi
            out.append(stat)
    return out


def pruned_read(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Zone-map pruned scan: read ONLY the parquet files of ``path`` whose
    footer ``[min, max]`` for ``col`` overlaps ``[lo, hi]`` — the data-
    skipping read that partition pruning (F4) performs at directory
    granularity and table formats (Iceberg/Delta manifests) perform at
    file granularity.  Returns ``(df, n_files_total, n_files_read)``.

    The pruning decision uses footer statistics ONLY (no data pages
    read); a file with missing stats for ``col`` is conservatively kept,
    so pruning can never drop a matching row — the caller still applies
    the exact predicate, pruning only shrinks the file list.  On a real
    lake the same overlap test runs against the manifest instead of a
    local listing; the per-file loop is metadata-sized (one entry per
    file), never row-sized.
    """
    stats = file_stats(path, [col])
    keep = [
        s["path"]
        for s in stats
        if s[f"{col}_min"] is None
        or s[f"{col}_max"] is None
        or not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    ]
    if not keep:
        return (
            spark.read.parquet(path).where(F.lit(False)),
            len(stats),
            0,
        )
    return spark.read.parquet(*keep), len(stats), len(keep)
