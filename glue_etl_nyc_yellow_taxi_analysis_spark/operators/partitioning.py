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

    The width probe estimates scan splits from the relation's file list
    (Spark's own packing math: files charged ``openCostInBytes``, packed
    into ``maxPartitionBytes`` splits) — `df.rdd.getNumPartitions()` would
    be exact but converts the plan to an RDD, ~80 ms of pure planning per
    call that the r11 bench measured as tens of seconds across the suite.
    Non-file relations and non-local schemes fall back to the exact probe.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    parts = _estimated_scan_partitions(df)
    if parts is None:
        parts = df.rdd.getNumPartitions()
    if parts < target:
        return df.repartition(target)
    return df


def _parse_bytes(v: str | None, default: int) -> int:
    """Spark size-conf string → bytes ("134217728", "128m", "1g", "4mb")."""
    if not v:
        return default
    s = v.strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    try:
        return int(s) * mult
    except ValueError:
        return default


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimated file-scan split count, or None when the relation is not
    a local file scan (caller falls back to the exact RDD probe)."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    max_split = _parse_bytes(
        conf.get("spark.sql.files.maxPartitionBytes", None), 128 << 20
    )
    open_cost = _parse_bytes(
        conf.get("spark.sql.files.openCostInBytes", None), 4 << 20
    )
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(u.path) + open_cost
        except OSError:
            return None
    return max(1, -(-total // max_split))


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
