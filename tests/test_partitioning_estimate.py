"""spread()'s file-split estimate must match Spark's actual packing.

Round-11 shipped a file-size estimate of the scan split count to avoid the
~80 ms plan→RDD conversion of the exact probe, but omitted the bytesPerCore
clamp of ``FilePartition.maxSplitBytes``: for inputs between ~maxSplitBytes
and maxPartitionBytes × defaultParallelism the estimate undercounted and
``spread()`` fired a spurious full round-robin shuffle the exact probe never
did.  These tests pin estimate == ``df.rdd.getNumPartitions()`` across
layouts (including a ~30×maxPartitionBytes input and the clamp's medium
range) and pin that spread() no longer repartitions a medium-size scan.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.partitioning import (
    _estimated_scan_partitions,
    _is_plain_scan_chain,
    spread,
)


@pytest.fixture()
def small_splits(spark):
    """Shrink the packing knobs so multi-split layouts fit in tiny files."""
    conf = spark.conf
    old = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    conf.set("spark.sql.files.openCostInBytes", str(4 * 1024))
    yield
    for k, v in old.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


def _write_payload(spark, path, rows, n_files):
    """Write ``rows`` rows of ~1 KB payload across ``n_files`` parquet files."""
    from pyspark.sql import functions as F

    (
        spark.range(rows)
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 512))
        .withColumn(
            "blob", F.repeat(F.sha2(F.col("id").cast("string"), 256), 16)
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


@pytest.mark.parametrize(
    "rows,n_files",
    [
        (50, 1),       # tiny single file: 1 split
        (200, 6),      # several small files: openCost-dominated packing
        (20000, 1),    # >30x maxPartitionBytes single file: many splits
        (300, 2),      # medium: bytesPerCore clamp active (total/8 < 64k)
        (3000, 2),     # above the clamp range: maxPartitionBytes packing
        (60000, 4),    # large multi-file
    ],
)
def test_estimate_matches_actual_partitions(
    spark, tmp_path, small_splits, rows, n_files
):
    path = str(tmp_path / f"t_{rows}_{n_files}")
    _write_payload(spark, path, rows, n_files)
    df = spark.read.parquet(path)
    est = _estimated_scan_partitions(df)
    actual = df.rdd.getNumPartitions()
    assert est == actual, f"estimate {est} != actual {actual} ({rows=} {n_files=})"


def test_estimate_matches_on_projected_filtered_scan(
    spark, tmp_path, small_splits
):
    path = str(tmp_path / "t_proj")
    _write_payload(spark, path, 3000, 2)
    df = spark.read.parquet(path).select("id", "payload").filter("id % 2 = 0")
    assert _is_plain_scan_chain(df)
    assert _estimated_scan_partitions(df) == df.rdd.getNumPartitions()


def test_repartitioned_input_falls_back_to_exact_probe(spark, tmp_path):
    """inputFiles() reflects the leaf scan, not the current partitioning —
    an already-widened df must NOT take the file-based estimate (it would
    re-add the repartition the exact probe skips)."""
    path = str(tmp_path / "t_rep")
    _write_payload(spark, path, 50, 1)
    df = spark.read.parquet(path).repartition(16)
    assert not _is_plain_scan_chain(df)
    assert _estimated_scan_partitions(df) is None
    # spread() of an already-wide df is a no-op (exact probe path):
    # the plan keeps the original Repartition and gains no second one
    out = spread(df)
    assert out.rdd.getNumPartitions() == 16
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("Repartition") == 1


def test_spread_noop_on_medium_scan(spark, tmp_path, small_splits):
    """A medium input (between maxSplitBytes and maxPB x cores) already
    plans ~defaultParallelism splits; spread() must not add a shuffle."""
    path = str(tmp_path / "t_med")
    _write_payload(spark, path, 300, 2)
    df = spark.read.parquet(path)
    # precondition: the clamp range (total under maxPB x parallelism,
    # over one maxSplitBytes) — actual partitions ~ defaultParallelism
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    out = spread(df)
    assert "Repartition" not in out._jdf.queryExecution().analyzed().toString()
