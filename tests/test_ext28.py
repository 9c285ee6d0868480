"""Behavioral tests for the ext28 sketch-backed scale lanes: the
cross-engine hash primitive, Bloom semi-join invariants, CMS one-sided
error, and the DP release mechanism."""

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext28 import (
    _BLOOM_K,
    _BLOOM_M,
    _DP_EPS,
    _DP_Z,
    _dp_thresholds,
    DUCK_HASH32,
    hash32,
)


def _py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hash32_matches_python_and_duckdb(spark):
    """The shared primitive every ext28 lane builds on: Spark's
    conv(md5) slice, DuckDB's hex-digit fold, and Python's int(md5[:8])
    must agree exactly — including values with a high bit set."""
    samples = ["hello", "", "dp5|click", "bloom0|42", "cms3|the", "ü→"]
    got = (
        spark.createDataFrame([(s,) for s in samples], ["s"])
        .select("s", hash32(F.col("s")).alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        assert r.h == _py_hash32(r.s), r.s
        duck = con.execute(
            f"SELECT {DUCK_HASH32.format(s='?')}", [r.s]
        ).fetchone()[0]
        assert duck == r.h, r.s
    assert any(r.h >= 1 << 31 for r in got)  # high bit exercised


def test_bloom_semijoin_invariants(spark, sf_dir):
    row = QUERIES["q_bloom_semijoin"](spark, sf_dir).collect()[0]
    # the defining Bloom guarantee: never drops a true match
    assert row.n_false_neg == 0
    assert row.n_candidates == row.n_true + row.n_false_pos
    assert row.n_candidates >= row.n_true
    assert 0 < row.n_true < row.n_fact
    assert row.n_fact == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_bloom_filter_table_is_bounded(spark, sf_dir):
    """The broadcast side must stay ≤ M/32 rows no matter the dim size —
    that bound is WHY the probe survives a 100 TB fact scan."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").cast("string").alias("k"))
    )
    pos = cust.select(
        F.explode(
            F.array(
                *[
                    (
                        hash32(F.concat(F.lit(f"bloom{j}|"), F.col("k")))
                        % _BLOOM_M
                    ).alias(f"p{j}")
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    n_words = pos.select(F.expr("pos DIV 32").alias("w")).distinct().count()
    assert n_words <= _BLOOM_M // 32


def test_cms_never_underestimates(spark, sf_dir):
    rows = QUERIES["q_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_n >= r.exact_n
        assert r.overcount == r.est_n - r.exact_n >= 0
    # ranked by estimate, deterministic tiebreak
    keys = [(-r.est_n, r.token) for r in rows]
    assert keys == sorted(keys)


def test_cms_top1_matches_exact_top1(spark, sf_dir):
    """With 4×1024 counters and this vocabulary, the heaviest token's
    estimate should identify the true heaviest token."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_top = (
        docs.select(F.explode(text.tokens("text")).alias("token"))
        .groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .first()
    )
    cms_top = QUERIES["q_cms_heavy_hitters"](spark, sf_dir).first()
    assert cms_top.token == exact_top.token


def test_dp_thresholds_are_a_valid_cdf():
    ts = _dp_thresholds()
    assert len(ts) == 2 * _DP_Z + 1
    assert ts[-1] == (_DP_Z, 2**32)
    cuts = [t for _, t in ts]
    assert cuts == sorted(cuts)
    # symmetric mechanism: P(z) ≈ P(-z), z=0 the mode
    alpha = math.exp(-_DP_EPS)
    p0 = (ts[_DP_Z][1] - ts[_DP_Z - 1][1]) / 2**32
    assert abs(p0 - (1 - alpha) / (1 + alpha)) < 1e-3


def test_dp_noisy_counts_mechanism(spark, sf_dir):
    rows = QUERIES["q_dp_noisy_counts"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    true = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert {r.event_type for r in rows} == set(true)
    for r in rows:
        assert r.true_n == true[r.event_type]
        assert r.noisy_n == r.true_n + r.noise_z
        assert abs(r.noise_z) <= _DP_Z
    # the seed is chosen so the fixture exercises nonzero noise arms —
    # an all-zero draw would leave the inverse-CDF CASE chain untested
    assert any(r.noise_z != 0 for r in rows)


def test_dp_draw_distribution_tracks_discrete_laplace():
    """1000 synthetic keys through the threshold table: the empirical
    z=0 mass must sit near the closed-form (1-α)/(1+α)."""
    ts = _dp_thresholds()

    def draw(key):
        u = _py_hash32(key)
        for z, t in ts:
            if u < t:
                return z
        return _DP_Z

    zs = [draw(f"dp5|k{i}") for i in range(1000)]
    p0 = sum(1 for z in zs if z == 0) / len(zs)
    alpha = math.exp(-_DP_EPS)
    assert abs(p0 - (1 - alpha) / (1 + alpha)) < 0.06
    assert min(zs) < 0 < max(zs)


def test_sketch_operators_reusable_api(spark):
    """The operators/sketches.py surface works on arbitrary tables, not
    just the ext28 fixtures: bloom never drops members, CMS estimates
    dominate true counts."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import sketches

    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["id"])
    bloom = sketches.bloom_build(keys, "id", m_bits=4096, k=3)
    assert bloom.count() <= 4096 // 32
    probe_rows = spark.createDataFrame(
        [(f"k{i}",) for i in range(100)], ["id"]
    )
    hits = {
        r.id: r.member
        for r in sketches.bloom_probe(
            probe_rows, bloom, "id", m_bits=4096, k=3, out_col="member"
        ).collect()
    }
    assert all(hits[f"k{i}"] for i in range(50))  # no false negatives
    # output schema = input columns + flag, nothing leaked
    assert set(hits) == {f"k{i}" for i in range(100)}

    counts = spark.createDataFrame(
        [("a", 10), ("b", 3), ("c", 7)], ["key", "n"]
    )
    placed = sketches.cms_place(counts, "key", "n", d=2, w=16)
    cms = sketches.cms_build(placed, "n")
    est = {
        r.key: r.est_n
        for r in sketches.cms_estimate(placed, cms, "key").collect()
    }
    true = {"a": 10, "b": 3, "c": 7}
    assert all(est[k] >= v for k, v in true.items())


def test_bloom_pruned_join_equals_plain_join(spark, sf_dir):
    """Row-for-row equality with the unpruned join, and the unsound
    join types are refused."""
    import pytest

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import joins

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    pruned = sorted(
        map(tuple, joins.bloom_pruned_join(orders, cust, "o_custkey").collect())
    )
    plain = sorted(map(tuple, orders.join(cust, "o_custkey").collect()))
    assert pruned == plain and len(pruned) > 0
    with pytest.raises(ValueError):
        joins.bloom_pruned_join(orders, cust, "o_custkey", how="left")


def test_sketch_merge_is_lossless(spark, sf_dir):
    """Per-batch sketches merged (CMS cell-sum, Bloom bit-OR) must equal
    the one-pass whole-corpus sketch in EVERY cell/word — the property
    that lets a standing sketch absorb new shards without rescans."""
    rows = {r.sketch: r for r in QUERIES["q_sketch_merge"](spark, sf_dir).collect()}
    assert set(rows) == {"cms", "bloom"}
    for r in rows.values():
        assert r.n_equal == r.n_cells > 0
        assert r.total_mass > 0


def test_stream_bloom_admission_paths(spark, sf_dir):
    """Both verdict paths exercised, and the impossible row class
    (bloom miss on truly-seen content) is absent — the per-row
    no-false-negative proof the streaming admission rests on."""
    rows = QUERIES["q_stream_bloom_admission"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(not (r.bloom_hit == 0 and r.truly_seen == 1) for r in rows)
    # the re-delivered slice (doc_id % 9 == 0) must hit; fresh content
    # overwhelmingly admits directly
    assert any(r.bloom_hit == 1 and r.truly_seen == 1 for r in rows)
    assert any(r.bloom_hit == 0 and r.truly_seen == 0 for r in rows)
    redelivered = [r for r in rows if r.doc_id % 9 == 0]
    assert redelivered and all(r.bloom_hit == 1 for r in redelivered)
