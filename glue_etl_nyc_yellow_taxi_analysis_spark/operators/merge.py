"""Merge / upsert without a table format: the snapshot-merge operator.

The reference's warehouse load is append-only (`etl-glue-load-to-postgres.py:86-88`);
real warehouse maintenance needs upsert.  Without Delta/Iceberg the scalable
plain-parquet form is a snapshot merge: keep base rows whose key has no
update (left-anti join), union the updates.  Both sides shuffle once on the
key; with a small update set Catalyst broadcasts it and the base never
shuffles at all — at 100 TB that is the difference between a metadata-sized
job and a full rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Upsert semantics (MERGE WHEN MATCHED THEN UPDATE ALL / WHEN NOT
    MATCHED THEN INSERT ALL): updates win on key collision, new keys append.

    Column sets must match (positional-independent: unionByName).

    ``updates`` must carry at most ONE row per key — SQL MERGE raises on
    multiple matches, and a plain union would silently emit duplicate key
    rows (review r4).  For CDC batches that can carry several changes per
    key, pass ``order_col`` (a version/sequence column): the highest
    value wins deterministically (arg-max over a struct — exactly the
    keyed-dedup idiom q_dedup_keyed documents).

    NULL ``order_col`` semantics: Spark struct ordering sorts NULL lowest,
    so a NULL-versioned row loses to ANY non-NULL version; if every row
    for a key is NULL-versioned, the tie is broken by the remaining
    column values (value-deterministic, but semantically arbitrary).  A
    CDC source that can emit NULL versions should filter or default them
    before calling — this operator will not raise.
    """
    if order_col is not None:
        others = [c for c in updates.columns if c not in keys]
        packed = updates.select(
            *keys,
            F.struct(
                F.col(order_col).alias("__o"),
                *[F.col(c).alias(c) for c in others],
            ).alias("__s"),
        )
        winner = packed.groupBy(*keys).agg(F.max("__s").alias("__s"))
        updates = winner.select(
            *keys, *[F.col(f"__s.{c}").alias(c) for c in others]
        ).select(*base.columns)  # restore column order
    untouched = base.join(updates.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(updates)
