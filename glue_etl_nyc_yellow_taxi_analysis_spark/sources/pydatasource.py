"""Custom Python DataSource (Spark 4 datasource API) — the extensibility
on-ramp for sources Spark has no built-in reader for (device feeds, niche
archive formats, internal services).

The reference ingests only what S3 hands it (SURVEY §2.1 S1-S2); a real
platform eventually needs a source Spark doesn't ship.  Spark 4's Python
DataSource API makes that a pure-Python class pair (DataSource +
DataSourceReader) with genuine partition-parallel reads — each
InputPartition is read independently on an executor, so the source scales
out like any file scan.

``SyntheticSensorSource`` here is the deterministic reference instance:
``n`` readings sharded over ``parts`` partitions, every cell a pure
function of the sequence number (an LCG step), so an external oracle can
reproduce it closed-form.  Swap the ``read`` body for an API/archive
client and the scaffold is production shape.

Deployment note: the classes are built inside a factory function, so
cloudpickle serializes them BY VALUE — executors never need this package
on their PYTHONPATH.  A module-level class would pickle by reference and
fail on any worker without the repo installed (exactly how the driver's
vanilla session runs it).
"""

from __future__ import annotations


def _build_source_class():
    """Factory: classes defined at function scope are cloudpickled by
    value, making the source self-contained for plain-session workers."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    # LCG constants (glibc) — the deterministic "measurement"
    lcg_a, lcg_c, lcg_m = 1103515245, 12345, 1000

    class _SensorReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 10_000))
            self.parts = int(options.get("parts", 8))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            # round-robin shard: partition i owns seq = i, i+parts, …
            i = partition.value
            for seq in range(i, self.n, self.parts):
                yield (seq, seq % self.parts, (seq * lcg_a + lcg_c) % lcg_m)

    class SyntheticSensorSource(DataSource):
        """`spark.read.format("synthetic_sensor").option("n", …).load()`
        → (seq bigint, device int, reading bigint), computed
        per-partition on executors."""

        @classmethod
        def name(cls):
            return "synthetic_sensor"

        def schema(self):
            return "seq bigint, device int, reading bigint"

        def reader(self, schema):
            return _SensorReader(self.options)

    return SyntheticSensorSource


def register(spark) -> None:
    """Idempotent registration of the source into a session."""
    try:
        spark.dataSource.register(_build_source_class())
    except Exception as e:
        # the API has no lookup, so double-registration is detected by
        # message — anything else (import error inside the factory, API
        # drift) must surface here, not later as 'data source not found'
        msg = str(e).lower()
        if "already" in msg and ("exist" in msg or "register" in msg):
            return
        raise
