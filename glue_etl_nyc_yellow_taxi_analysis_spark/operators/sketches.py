"""Sketch operators: Bloom filters, Count-Min, seeded DP noise.

The shared primitive is a DETERMINISTIC cross-engine 32-bit hash
(``hash32``: integer value of the first 8 hex chars of md5) so every
sketch built here can be replayed bit-exactly by a DuckDB oracle — the
md5-lane convention from ``operators/dedup.py``.  Production swaps
``hash32`` for ``xxhash64`` the same way the dedup stack does (the md5
lane stays as the hash-proven twin).

Scale posture: each structure is a FIXED-size summary independent of
input cardinality — a Bloom filter is ≤ m/32 (word, bits) rows, a CMS
is d·w counter rows, a DP inverse-CDF is 2Z+1 literals — so the only
corpus-sized work is one keyed aggregate to build and a broadcast probe
to use.  That is the shape that survives a 1000-executor fact scan:
the fact side NEVER shuffles for any operator in this module.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash32(col: Column | str) -> Column:
    """Deterministic 32-bit unsigned hash as a BIGINT column: integer
    value of the first 8 hex chars of md5.  Oracle twin: DUCK_HASH32."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# DuckDB has no conv(); fold the 8 hex digits positionally.  Exact: each
# term ≤ 15·16^7 < 2^32 and the sum < 2^32, inside double's exact-integer
# range before the BIGINT cast.
DUCK_HASH32 = (
    "CAST(list_sum(list_transform(range(0,8), i ->"
    " (strpos('0123456789abcdef', substr(md5({s}), i+1, 1)) - 1)"
    " * CAST(power(16, 7-i) AS BIGINT))) AS BIGINT)"
)

# bits per Bloom word: 1<<31 fits BIGINT on both engines (DuckDB raises
# on CAST(1 AS BIGINT) << 63, so 64-bit words are NOT oracle-safe)
BLOOM_WORD = 32


def _bloom_positions(key: Column, m_bits: int, k: int, prefix: str) -> list[Column]:
    # double-underscore temp names: probe columns must not collide with
    # caller columns (bloom_probe restores the caller's schema on exit)
    return [
        (hash32(F.concat(F.lit(f"{prefix}{j}|"), key)) % m_bits).alias(f"__p{j}")
        for j in range(k)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    prefix: str = "bloom",
) -> DataFrame:
    """Aggregate a key column into a Bloom filter as a ≤ m/32-row
    (w, bits) table — one keyed aggregate over k positions per key,
    broadcastable whatever the dim cardinality."""
    key = F.col(key_col).cast("string")
    return (
        keys.select(F.explode(F.array(*_bloom_positions(key, m_bits, k, prefix))).alias("pos"))
        .select(
            F.expr(f"pos DIV {BLOOM_WORD}").alias("w"),
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD} AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    prefix: str = "bloom",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership-test ``df[key_col]`` against a ``bloom_build`` table:
    k broadcast left-joins on the word index + O(1) bit probes, ANDed
    into ``out_col``.  No false negatives by construction; false
    positives at the configured m/k rate.  The probe never shuffles
    ``df`` — this is the runtime-filter shape that prunes a fact scan
    before an expensive exchange."""
    key = F.col(key_col).cast("string")
    out = df.select("*", *_bloom_positions(key, m_bits, k, prefix))
    for j in range(k):
        bj = bloom.select(F.col("w").alias(f"__w{j}"), F.col("bits").alias(f"__bits{j}"))
        out = out.join(
            F.broadcast(bj),
            F.expr(f"__p{j} DIV {BLOOM_WORD}") == F.col(f"__w{j}"),
            "left",
        ).withColumn(
            f"__hit{j}",
            F.expr(
                f"(shiftright(coalesce(__bits{j}, 0L),"
                f" CAST(__p{j} % {BLOOM_WORD} AS INT)) & 1) = 1"
            ),
        )
    hit = F.col("__hit0")
    for j in range(1, k):
        hit = hit & F.col(f"__hit{j}")
    keep = [c for c in df.columns]
    return out.select(*keep, hit.alias(out_col))


def cms_place(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    d: int = 4,
    w: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Expand pre-combined (key, count) rows to their d sketch cells:
    (key, count, r, pos).  CMS is LINEAR, so building from partial
    counts equals streaming per-occurrence increments — the corpus-wide
    shuffle carries one row per DISTINCT key, never per occurrence."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (hash32(F.concat(F.lit(f"{prefix}{r}|"), F.col(key_col))) % w).alias(
                    "pos"
                ),
            )
            for r in range(d)
        ]
    )
    return counts.select(
        key_col, count_col, F.explode(rows).alias("rp")
    ).select(
        key_col,
        count_col,
        F.col("rp.r").alias("r"),
        F.col("rp.pos").alias("pos"),
    )


def cms_build(placed: DataFrame, count_col: str) -> DataFrame:
    """Reduce ``cms_place`` output to the d·w counter table (r, pos,
    counter) — fixed size whatever the key cardinality."""
    return placed.groupBy("r", "pos").agg(F.sum(count_col).alias("counter"))


def cms_estimate(placed: DataFrame, cms: DataFrame, key_col: str) -> DataFrame:
    """Min-over-rows CMS estimate per key: broadcast-join the counter
    table back to the placed cells and take the row minimum.  Estimates
    are one-sided (est ≥ true count, always)."""
    return (
        placed.join(F.broadcast(cms), ["r", "pos"])
        .groupBy(key_col)
        .agg(F.min("counter").alias("est_n"))
    )


def dp_discrete_laplace_thresholds(eps: float, z_max: int) -> list[tuple[int, int]]:
    """Inverse-CDF thresholds for the truncated discrete Laplace
    (two-sided geometric), P(z) ∝ exp(-eps·|z|), z ∈ [-Z, Z], as integer
    cutoffs on a uniform u ∈ [0, 2^32): noise = first z with u < t_z.
    Computed ONCE driver-side; Spark plan and SQL oracle compare the
    SAME literals, so query-time arithmetic is pure integer comparison
    on both sides (no libm divergence — the q_benford lesson)."""
    alpha = math.exp(-eps)
    weights = [alpha ** abs(z) for z in range(-z_max, z_max + 1)]
    total = sum(weights)
    out = []
    cum = 0.0
    for z, wt in zip(range(-z_max, z_max + 1), weights):
        cum += wt
        out.append((z, min(int(round(cum / total * 2**32)), 2**32)))
    out[-1] = (z_max, 2**32)  # close the interval exactly
    return out


def dp_noise(key: Column | str, eps: float, z_max: int, seed: str) -> Column:
    """Seeded deterministic discrete-Laplace noise column: hash-uniform
    of (seed | key) pushed through the integer inverse-CDF."""
    u = hash32(F.concat(F.lit(f"{seed}|"), F.col(key) if isinstance(key, str) else key))
    noise = None
    for z, t in dp_discrete_laplace_thresholds(eps, z_max):
        cond = u < F.lit(t)
        noise = F.when(cond, F.lit(z)) if noise is None else noise.when(cond, F.lit(z))
    return noise.otherwise(F.lit(z_max)).cast("long")
