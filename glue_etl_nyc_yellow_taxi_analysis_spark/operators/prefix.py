"""Scalable running (prefix) sums.

A cumulative window partitioned by a low-cardinality group key caps
parallelism at the group count — with 5 event types, a 100 TB sweep
funnels into 5 serial window partitions.  ``running_sum`` computes the
identical prefix sum with parallelism ``groups × chunks``:

1. per-group bounds of the (numeric) order key — tiny agg, broadcast;
2. rows assigned to C order-contiguous chunks; per-(group, chunk)
   value totals (one map-side-combined shuffle, C·|groups| rows out);
3. exclusive prefix of the chunk totals per group (window over ≤C rows);
4. each chunk's rows run their own in-chunk cumulative window and add
   the chunk's carry-in — partitionBy (group, chunk), so the serial
   span is one chunk, not one group.

Identical-order-key rows land in the same chunk, so results equal the
single-window formulation wherever that formulation is itself
well-defined (ties pre-merged or a total order supplied) — the same
contract the naive window has.

Companion of operators/quantiles.weighted_median (the same two-phase
idea, applied to quantile location instead of full prefix output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    n_chunks: int = 64,
    out_col: str = "running",
) -> DataFrame:
    """All input columns preserved; adds ``out_col`` = per-group running
    sum of ``value_col`` in ``order_col`` order.  ``order_col`` must be
    numeric (cast timestamps to epoch integers first)."""
    g, o, v = group_col, order_col, value_col

    # joins back to the per-group tables are NULL-SAFE: a window
    # PARTITION BY treats NULL as one real group, and a plain equi-join
    # would silently drop every NULL-group row (hostile-gate finding,
    # round 5)
    bounds = df.groupBy(g).agg(F.min(o).alias("_lo"), F.max(o).alias("_hi"))
    binned = df.join(
        F.broadcast(bounds.withColumnRenamed(g, "_bg")),
        F.col(g).eqNullSafe(F.col("_bg")),
    ).drop("_bg").withColumn(
        "_chk",
        F.when(F.col("_lo") == F.col("_hi"), F.lit(0)).otherwise(
            F.least(
                F.lit(n_chunks - 1),
                F.floor(
                    (F.col(o) - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / n_chunks)
                ).cast("int"),
            )
        ),
    )
    ctot = binned.groupBy(g, "_chk").agg(F.sum(v).alias("_cv"))
    w_chunks = (
        Window.partitionBy(g)
        .orderBy("_chk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = ctot.select(
        g, "_chk", F.sum("_cv").over(w_chunks).alias("_carry")
    )
    w_fine = (
        Window.partitionBy(g, "_chk")
        .orderBy(o)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        binned.join(
            F.broadcast(
                carry.withColumnRenamed(g, "_cg").withColumnRenamed("_chk", "_cchk")
            ),
            F.col(g).eqNullSafe(F.col("_cg")) & (F.col("_chk") == F.col("_cchk")),
        )
        .drop("_cg", "_cchk")
        .withColumn(
            out_col,
            F.sum(v).over(w_fine) + F.coalesce(F.col("_carry"), F.lit(0)),
        )
        .drop("_lo", "_hi", "_chk", "_carry")
    )
