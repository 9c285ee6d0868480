"""Skew handling demonstrated on a genuinely hostile power-law fixture.

r5 verdict item: q_salt_plan profiles skew and q_salted_join/agg prove
equivalence on UNIFORM driver data — but nothing ran on data where one
key actually dominates.  This module builds a corpus where ONE key owns
30% of all rows and asserts three things:

1. the salted shuffle physically bounds the max task input (fails if
   ``partitioning.salt`` is removed or degenerates to a constant),
2. the salted join is bit-equal to the plain join under real skew,
3. AQE's runtime skew splitting (``spark.sql.adaptive.skewJoin``)
   accepts the same plan and agrees on the result.
"""

import pytest
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.partitioning import (
    explode_salt,
    salt,
)

N_ROWS = 60_000
HOT_KEY = 7
HOT_ROWS = N_ROWS * 3 // 10          # one key = 30% of the corpus
N_KEYS = 1_000
BUCKETS = 16
SHUFFLE_PARTS = 32


@pytest.fixture(scope="module")
def skewed(spark):
    """(fact, dim): fact has a 30%-hot key, dim is one row per key."""
    fact = spark.range(N_ROWS).select(
        F.when(F.col("id") < HOT_ROWS, F.lit(HOT_KEY))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        # near-unique v: the salt hashes the whole row, so low-cardinality
        # payloads would quantize the hot key into coarse salt lumps
        (F.col("id") % 9973).cast("long").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id") % 7).alias("grp")
    )
    return fact, dim


def _max_partition_rows(df, *cols):
    sized = (
        df.repartition(SHUFFLE_PARTS, *[F.col(c) for c in cols])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    return max(r["count"] for r in sized)


def test_salt_bounds_max_task_input(skewed):
    """The physical shuffle distribution: keyed-only repartitioning puts
    the whole hot key (>=30% of rows) in ONE task; salting must cap the
    max task at roughly hot/BUCKETS.  Removing the salt column (or a
    constant salt) makes this fail."""
    fact, _ = skewed
    unsalted_max = _max_partition_rows(fact, "k")
    assert unsalted_max >= HOT_ROWS  # the hostile premise holds

    salted = salt(fact, "k", buckets=BUCKETS)
    # the salt must actually split the HOT key, not just exist
    hot_spread = (
        salted.filter(F.col("k") == HOT_KEY)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(hot_spread) == BUCKETS
    assert max(r["count"] for r in hot_spread) <= int(HOT_ROWS / BUCKETS * 1.5)

    salted_max = _max_partition_rows(salted, "k", "__salt")
    # bounded: no task owns more than ~2x the ideal even share; with the
    # hot key intact in one task this would be >= HOT_ROWS (18k vs ~3.7k)
    assert salted_max <= 2 * N_ROWS // SHUFFLE_PARTS
    assert salted_max * 4 < unsalted_max


def test_salted_join_equivalent_under_skew(skewed):
    """Salt-fact + explode-dim join must be bit-equal to the plain join
    on the hostile corpus (the uniform-data equivalence q_salted_join
    already pins, re-proven where it matters)."""
    fact, dim = skewed
    plain = (
        fact.join(dim, "k")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salt(fact, "k", buckets=BUCKETS)
        .join(explode_salt(dim, buckets=BUCKETS), ["k", "__salt"])
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_aqe_skew_join_agrees(spark, skewed):
    """AQE runtime skew splitting on the same hostile corpus: force a
    sort-merge join with thresholds low enough that the hot partition
    qualifies, and require the same result as the broadcast/plain path."""
    fact, dim = skewed
    expected = sorted(
        map(
            tuple,
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .collect(),
        )
    )
    conf = spark.conf
    before = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        got = (
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        )
        assert sorted(map(tuple, got.collect())) == expected
    finally:
        for k, v in before.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
