"""Two-phase 2-D skyline (Pareto frontier).

A point dominates another when it is >= on both axes and strictly
greater on at least one; the skyline is the set of non-dominated points.
The naive formulation is a quadratic self-join (NOT EXISTS) — hopeless
at scale.  Two properties make it distributable:

* **window form**: over DISTINCT (x, y) pairs ordered by
  ``x DESC, y DESC``, a pair is dominated iff the running max of ``y``
  over the PRECEDING rows is >= its own ``y`` (a preceding row has
  either strictly greater x, or equal x and strictly greater y — both
  dominate when its y >= ours).  One sort, no self-join.
* **local-then-global**: the skyline of a union is contained in the
  union of per-partition skylines, so phase 1 prunes each scan
  partition independently (parallel windows keyed by
  ``spark_partition_id``) and phase 2 re-runs the same pass on the
  small survivor set.

Phase 1 parallelism = #scan partitions; phase 2 input is tiny (the
frontier of a random partition of n points has expected O(log n)
points per group).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _skyline_pass(df: DataFrame, part_cols: Sequence[str], x: str, y: str) -> DataFrame:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(x).desc(), F.col(y).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__runmax_y", F.max(y).over(w))
        .filter(F.col("__runmax_y").isNull() | (F.col("__runmax_y") < F.col(y)))
        .drop("__runmax_y")
    )


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group Pareto frontier over distinct ``(x, y)`` pairs.

    Requires distinct pairs (the window tie logic assumes no duplicate
    (x, y) within a group) — the leading ``.distinct()`` guarantees it.
    """
    pairs = df.select(*group_cols, x, y).distinct()
    local = _skyline_pass(
        pairs.withColumn("__pid", F.spark_partition_id()),
        [*group_cols, "__pid"],
        x,
        y,
    ).drop("__pid")
    return _skyline_pass(local, list(group_cols), x, y)
