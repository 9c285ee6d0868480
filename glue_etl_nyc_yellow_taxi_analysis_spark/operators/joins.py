"""Join operators (SURVEY §2.4 J1 + the star-join family).

The reference executes exactly one join (fact ↔ 24-row hour band,
DM:317-319) but its product — a star schema — exists to be joined.  The
engine therefore exposes the full equi-join family with scale-correct
physical strategy defaults:

- dimension joins: explicit ``F.broadcast`` on the small side — no shuffle
  of the fact, ever (Catalyst would auto-broadcast ≤10 MB, but at 100 TB you
  do not want a mis-estimated dimension to trigger a sort-merge of the fact).
- fact↔fact joins: left to Catalyst/AQE (sort-merge with skew splitting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J1 — fact ↔ small-dimension equi join, dimension broadcast.

    Replaces DM:317-319 (qualified-column join + star select) with the
    idiomatic form; with ``on`` as column name(s), the join key appears once
    in the output, so no post-join drop is needed.
    """
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """left rows WITH a match — EXISTS subquery shape (no right columns)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """left rows WITHOUT a match — NOT EXISTS shape."""
    return left.join(right, on, "left_anti")


def star_join(fact: DataFrame, dims: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """Chain broadcast joins of a fact to many dimensions.

    ``dims`` maps alias → (dim_df, key).  All dims broadcast: the fact is
    never shuffled; the whole chain is one stage of broadcast-hash joins.
    """
    out = fact
    for _alias, (dim, key) in dims.items():
        out = out.join(F.broadcast(dim), key, "inner")
    return out
