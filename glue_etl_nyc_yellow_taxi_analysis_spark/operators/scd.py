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
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Change log → SCD2 rows: (key, attrs, valid_from, valid_to, is_current).

    ``valid_to`` is the next change's timestamp (NULL while current).  The
    order carries ``tiebreak_col`` (a unique id) so simultaneous changes
    produce a deterministic history.

    ``partition_cols``: when ``key_col`` is a derived compound key whose
    NULL-propagating construction collapses distinct business keys to one
    NULL (e.g. concat of nullable fields), pass the UNDERLYING columns so
    histories partition on the real key — SQL windows treat NULLs as equal
    WITHIN each column, never across different keys, and chaining
    unrelated NULL-keyed rows into one history is wrong (hostile-corpus
    agreement gate, round 5).  Defaults to [key_col].
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*(partition_cols or [key_col])).orderBy(*order)
    return df.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
