"""Scale-safe global row indexing.

``ROW_NUMBER() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole table into ONE window partition — a single task sorts 100 TB.  The
two-phase plan here keeps the sort distributed:

1. bucket boundaries from ``approx_percentile`` (one column-pruned agg);
2. exact per-bucket counts (second column-pruned agg, ~B rows to the
   driver — the same "tiny statistics to the driver" move AQE itself
   makes) → cumulative offsets;
3. per-bucket ``row_number`` (windows run in parallel across buckets)
   plus the broadcast offset.

The result is byte-identical to the single-partition window: buckets are
ranges of the order key, so bucket order + intra-bucket order = total
order.  Any boundary skew only unbalances work, never correctness — the
offsets come from exact counts, not from the quantile sketch.

Reference anchor: the reference never needs a global index (its surrogate
PK is ``uuid()``, etl-glue-nyc-yellow-data-model.py:279), but a
contiguous stable index is the standard warehouse/ML-pipeline sibling of
that PK (sample ids, deterministic train/test splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _range_buckets(
    df: DataFrame, order_col: str, buckets: int
) -> tuple[DataFrame, int]:
    """Shared phase 1: quantile boundaries → ``__bucket`` range-bucket
    column.  Returns (bucketed df, number of buckets).  The subtle
    ``repr(b)``-into-SQL literal interpolation lives in exactly one place
    (review r4) — a quoting/NaN fix here serves both consumers."""
    probs = [i / buckets for i in range(1, buckets)]
    row = df.select(
        F.expr(
            f"approx_percentile({order_col}, array({', '.join(map(str, probs))}), 10000)"
        ).alias("bs")
    ).first()
    # dedupe + sort: heavy skew can collapse quantiles onto one value
    bounds = sorted(set(row["bs"] or []))
    if bounds:
        lits = ", ".join(repr(b) for b in bounds)
        bucket_expr = F.expr(
            f"size(filter(array({lits}), b -> {order_col} > b))"
        )
    else:
        bucket_expr = F.lit(0)
    return df.withColumn("__bucket", bucket_expr.cast("int")), len(bounds) + 1


def global_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "idx",
    buckets: int = 32,
    start: int = 1,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Add a contiguous global index following ``ORDER BY order_col
    [, *tiebreak_cols]``.

    ``order_col`` must be numeric; ``(order_col, *tiebreak_cols)`` must be
    UNIQUE (uniqueness is what makes the index deterministic).  Bucketing
    uses ``order_col`` alone — buckets are value ranges, so rows equal on
    ``order_col`` always share a bucket and the intra-bucket window's
    tiebreak yields the same total order a single-partition
    ``ORDER BY order_col, *tiebreak_cols`` would.
    """
    bucketed, n_buckets = _range_buckets(df, order_col, buckets)

    counts = {
        r["__bucket"]: r["c"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = [], start
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["__bucket", "__offset"])

    w = Window.partitionBy("__bucket").orderBy(order_col, *(tiebreak_cols or []))
    return (
        bucketed.join(F.broadcast(off_df), "__bucket")
        .withColumn(
            index_col,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast("bigint"),
        )
        .drop("__bucket", "__offset")
    )


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    buckets: int = 32,
) -> DataFrame:
    """Global running sum of ``value_col`` following ``ORDER BY order_col``
    — the same two-phase plan as ``global_index`` (a bare
    ``SUM() OVER (ORDER BY ...)`` is a one-task sort at 100 TB):

    1. range-bucket on quantile boundaries of ``order_col`` (unique,
       numeric — caller supplies the tiebreak);
    2. per-bucket value sums → exact cumulative offsets (B rows to the
       driver);
    3. intra-bucket running sum windows in parallel + broadcast offset.

    ``value_col`` must be integral (exact offsets); the result is
    byte-identical to the single-partition window.  This is the
    backbone of sequence packing: token budgets are running sums.
    """
    bucketed, n_buckets = _range_buckets(df, order_col, buckets)

    sums = {
        r["__bucket"]: r["s"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += int(sums.get(b) or 0)
    off_df = df.sparkSession.createDataFrame(offsets, ["__bucket", "__offset"])

    w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(off_df), "__bucket")
        .withColumn(
            out_col,
            (F.sum(value_col).over(w) + F.col("__offset")).cast("bigint"),
        )
        .drop("__bucket", "__offset")
    )


def keyed_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    buckets: int = 32,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-KEY running sum of ``value_col`` following ``ORDER BY
    order_col [, *tiebreak_cols]`` within each ``key_cols`` group — the
    keyed sibling of ``global_running_sum``.

    A bare ``SUM() OVER (PARTITION BY key ORDER BY ...)`` puts each
    key's ENTIRE group in one task: fine when keys are many and small,
    a single-task sort of the whole hot domain when one key dominates
    (the admission windows in jobs.web_ingest / jobs.pretrain_prep are
    exactly this shape — per-source packing where one over-crawled
    source can be half the corpus).  Two-phase instead:

    1. GLOBAL range buckets on ``order_col`` quantiles (one
       column-pruned agg — shared boundaries keep phase 1 a single
       pass; per-key imbalance across buckets costs balance, never
       correctness);
    2. per-(key, bucket) sums → per-key cumulative offsets via a
       window over ≤ B rows per key.  Unlike the global form the
       offsets table is |keys| × B and STAYS DISTRIBUTED — nothing is
       collected;
    3. intra-(key, bucket) running windows in parallel + the offset
       equi-join.  Max task ≈ hottest_key / B rows.

    ``order_col`` must be numeric and NON-NULL (encode NULLS LAST as a
    coalesce to a sentinel before calling); ``value_col`` integral;
    ``(order_col, *tiebreak_cols)`` unique within a key.  KEY columns
    MAY be NULL: PARTITION BY treats NULL as its own group, so the
    offset join is null-safe (a plain equi-join would silently DROP
    every NULL-key row — caught by the degenerate-corpus gate on first
    adoption).  Rows equal on ``order_col`` always share a bucket, so
    the result is byte-identical to the one-task window."""
    bucketed, _ = _range_buckets(df, order_col, buckets)
    kb = bucketed.groupBy(*key_cols, "__bucket").agg(
        F.sum(value_col).alias("__s")
    )
    w_off = (
        Window.partitionBy(*key_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = kb.select(
        *key_cols,
        "__bucket",
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__offset"),
    )
    for i, k in enumerate(key_cols):
        offs = offs.withColumnRenamed(k, f"__jk{i}")
    offs = offs.withColumnRenamed("__bucket", "__jb")
    cond = F.col("__bucket") == F.col("__jb")  # never NULL (order is non-NULL)
    for i, k in enumerate(key_cols):
        cond = cond & F.col(k).eqNullSafe(F.col(f"__jk{i}"))
    w = (
        Window.partitionBy(*key_cols, "__bucket")
        .orderBy(order_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(offs, cond)
        .withColumn(
            out_col,
            (F.sum(value_col).over(w) + F.col("__offset")).cast("bigint"),
        )
        .drop(
            "__bucket",
            "__jb",
            "__offset",
            *[f"__jk{i}" for i in range(len(key_cols))],
        )
    )
