"""Scalable exact weighted quantiles.

The textbook weighted median — a cumulative-weight window over each
group's full value order — parallelizes only per GROUP: with 3 groups,
a 100 TB scan funnels into 3 window partitions (the q_weighted_stats
v1 shape).  This module computes the same exact answer with the wide
data touched only by hash aggregates:

1. per-group value bounds (tiny agg, broadcast back);
2. rows binned into B value-ordered buckets; per-(group, bucket) weight
   totals (ONE shuffle with map-side combine — B·|groups| rows out);
3. a cumulative window over the B-row-per-group bucket totals (driver-
   scale) finds the bucket where half the total weight is crossed and
   its carry-in weight;
4. only THAT bucket's rows (≈1/B of the group) re-enter a cumulative
   window to locate the exact crossing value.

Determinism: weights are exact decimals; the crossing value is
invariant to tie order (equal values share a bucket and a threshold).

Reference: the engine's analytics layer (SURVEY §2.6/§2.9) — the
reference itself has no aggregation beyond count
(glue_job_scripts/etl-glue-load-to-postgres.py:67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    n_buckets: int = 64,
    out_col: str = "wmedian",
) -> DataFrame:
    """Exact weighted median of ``value_col`` per ``group_col``, weights
    summed as the column's own (decimal-castable) type.

    Returns one row per group: (group_col, out_col).
    """
    g, v, w = group_col, value_col, weight_col

    bounds = df.groupBy(g).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    binned = df.join(F.broadcast(bounds), g).withColumn(
        "_bkt",
        F.when(F.col("_lo") == F.col("_hi"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(v) - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / n_buckets)
                ).cast("int"),
            )
        ),
    )
    btot = binned.groupBy(g, "_bkt").agg(F.sum(w).alias("_bw"))

    w_cum = (
        Window.partitionBy(g)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(g)
    marked = btot.select(
        g,
        "_bkt",
        "_bw",
        F.sum("_bw").over(w_cum).alias("_cum"),
        F.sum("_bw").over(w_all).alias("_tot"),
    )
    # the target bucket: first whose cumulative weight reaches half
    target = (
        marked.filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(g)
        .agg(
            F.min_by(F.struct("_bkt", "_cum", "_bw", "_tot"), "_bkt").alias("_t")
        )
        .select(
            g,
            F.col("_t._bkt").alias("_bkt"),
            (F.col("_t._cum") - F.col("_t._bw")).alias("_carry"),
            F.col("_t._tot").alias("_tot"),
        )
    )

    # only the target bucket's rows see the exact cumulative window
    in_bucket = binned.join(F.broadcast(target), [g, "_bkt"])
    w_fine = (
        Window.partitionBy(g)
        .orderBy(v)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        in_bucket.withColumn("_cumw", F.sum(w).over(w_fine) + F.col("_carry"))
        .filter(F.col("_cumw") * 2 >= F.col("_tot"))
        .groupBy(g)
        .agg(F.min(v).alias(out_col))
    )
