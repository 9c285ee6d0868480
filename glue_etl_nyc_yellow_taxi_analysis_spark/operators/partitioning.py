"""Partition-layout operators — the knobs that matter at 100 TB.

``spread``  — widen a narrow input before a compute-bound stage.
``salt``    — explode a skewed join/group key into ``n`` subkeys (classic
              skew mitigation when AQE's runtime splitting isn't enough).
``coalesce_output`` — shrink partition count before a sink to avoid
              thousand-small-file outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure a compute-heavy stage has at least cluster-parallelism
    partitions.

    Small single-file inputs arrive as 1-2 scan partitions; running a
    CPU-bound expression pipeline (shingling, k-minhash, simhash, embedding
    math) over them single-threaded wastes the cluster.  One cheap
    round-robin shuffle of the raw rows buys full-width execution.  No-op
    when the input is already wide (the 100 TB case — large inputs arrive
    with thousands of splits).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salt(df: DataFrame, key: str, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Add a uniform salt column for skewed-key joins/aggregations.

    Pattern: salt the big side, explode the small side over all bucket
    values, join on (key, salt), then drop the salt.  Deterministic salt
    (hash of the full row via monotonically increasing id is NOT — use
    xxhash64 of stable columns when replayability matters).
    """
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)))


def explode_salt(dim: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Small-side twin of ``salt``: replicate each dim row once per bucket."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def coalesce_output(df: DataFrame, max_partitions: int) -> DataFrame:
    """Cap output file count before a sink (no shuffle — narrow coalesce)."""
    return df.coalesce(max_partitions)


def range_partition_sorted(df: DataFrame, cols: list[str], num_partitions: int) -> DataFrame:
    """Range-partition + sort within partitions on the same keys — the
    write-side layout for parquet data skipping: row-group min/max stats
    become disjoint, so later range predicates prune at the footer level.
    One sampling pass (range boundaries) + one shuffle; the sort folds into
    the shuffle's sort-based writer, no extra exchange (asserted in
    test_plans.py)."""
    return df.repartitionByRange(num_partitions, *cols).sortWithinPartitions(*cols)
