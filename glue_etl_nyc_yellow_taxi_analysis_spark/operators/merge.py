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


def merge_upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert semantics (MERGE WHEN MATCHED THEN UPDATE ALL / WHEN NOT
    MATCHED THEN INSERT ALL): updates win on key collision, new keys append.

    Column sets must match (positional-independent: unionByName).
    """
    untouched = base.join(updates.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(updates)
