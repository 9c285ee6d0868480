"""Slowly-changing-dimension (type 2) history builder.

The reference builds a Kimball star (SURVEY.md §1.1) whose dimensions are
static snapshots; SCD2 is the standard warehouse evolution of that model —
each attribute change closes the previous row's validity window and opens a
new one.  Pure window functions: one shuffle on the business key, no joins,
no state — scales linearly with the change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change log → SCD2 rows: (key, attrs, valid_from, valid_to, is_current).

    ``valid_to`` is the next change's timestamp (NULL while current).  The
    order carries ``tiebreak_col`` (a unique id) so simultaneous changes
    produce a deterministic history.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return df.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
