"""similarity.semdedup_dups (the vectorized SemDeDup pair kernel) must
reproduce the old JVM self-join + min aggregate exactly — including the
round(cos, 6) >= tau boundary, ragged/NULL/zero-norm vectors, and NULL
elements."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import similarity

_TAU = 0.2


def _jvm_reference(assigned):
    a, b = assigned.alias("a"), assigned.alias("b")
    pair_cos = F.round(
        F.try_divide(
            similarity.dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.nrm") * F.col("b.nrm"),
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.rep_id") == F.col("b.rep_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(pair_cos >= F.lit(_TAU))
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )


def _assigned(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, rep_id long, embedding array<float>"
    )
    return df.withColumn("nrm", similarity.l2_norm(F.col("embedding")))


def _check(spark, rows):
    assigned = _assigned(spark, rows)
    ref = sorted(map(tuple, _jvm_reference(assigned).collect()))
    got = sorted(
        map(tuple, similarity.semdedup_dups(assigned, _TAU).collect())
    )
    assert got == ref, f"kernel {got} != reference {ref}"


def test_degenerate_vectors_match_reference(spark):
    rows = [
        (1, 10, [1.0, 0.0, 0.0]),
        (2, 10, [1.0, 0.0, 0.0]),        # exact dup of 1
        (3, 10, [0.0, 1.0, 0.0]),        # orthogonal: below tau
        (4, 10, [0.0, 0.0, 0.0]),        # zero norm -> NULL cosine
        (5, 10, None),                    # NULL embedding
        (6, 10, []),                      # empty vector
        (7, 10, [1.0, 0.0]),              # ragged: shorter length
        (8, 10, [1.0, 0.0]),              # pairs only with 7
        (9, 11, [1.0, 0.0, 0.0]),        # different rep: no pair with 1
        (10, 10, [0.5, 0.1, 0.0]),
        (11, 10, [-1.0, 0.0, 0.0]),      # negative cosine
    ]
    _check(spark, rows)


def test_threshold_boundary_matches_reference(spark):
    import math

    # engineer cosines straddling tau = 0.2: unit x-axis vs vectors at
    # angle acos(c) for c just below/above/at the rounding boundary
    base = [(0, 20, [1.0, 0.0])]
    rows = list(base)
    for i, c in enumerate(
        [0.2, 0.1999994, 0.1999995, 0.1999996, 0.2000004, 0.2000005,
         0.19999949, 0.20000049, 0.1999999999]
    ):
        s = math.sqrt(max(0.0, 1.0 - c * c))
        rows.append((i + 1, 20, [c, s]))
    _check(spark, rows)


def test_prune_chain_semantics(spark):
    # a pruned vector still prunes its successors (single-pass pairwise)
    rows = [
        (1, 30, [1.0, 0.0]),
        (2, 30, [1.0, 0.0]),
        (3, 30, [1.0, 0.0]),
    ]
    _check(spark, rows)
    assigned = _assigned(spark, rows)
    got = {
        r["vec_id"]: r["dup_of"]
        for r in similarity.semdedup_dups(assigned, _TAU).collect()
    }
    assert got == {2: 1, 3: 1}
