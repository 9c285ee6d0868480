"""Behavioral tests for the round-3 fifth-pass batch (queries_ext20)."""

import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _dec18(x: float) -> Decimal:
    """Replicate Spark's double -> DECIMAL(27,18) cast: shortest repr,
    HALF_UP at scale 18."""
    return Decimal(repr(x)).quantize(Decimal("1e-18"), rounding=ROUND_HALF_UP)


def test_salt_plan_factors_and_shares(spark, sf_dir):
    rows = QUERIES["q_salt_plan"](spark, sf_dir).collect()
    total = sum(r["n_rows"] for r in rows)
    for r in rows:
        assert r["salt_factor"] == -(-r["n_rows"] // 2000)  # ceil
        assert r["share_ppm"] == r["n_rows"] * 1_000_000 // total
    # shares partition the traffic up to integer-floor loss
    assert 1_000_000 - len(rows) < sum(r["share_ppm"] for r in rows) <= 1_000_000


def test_dup_graph_degree_partitions_corpus(spark, sf_dir):
    rows = QUERIES["q_dup_graph_degree"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    by_deg = {r["degree"]: r["n_docs"] for r in rows}
    assert 0 in by_deg  # the zero row is always emitted
    assert all(d >= 0 for d in by_deg)
    # planted near-dups mean at least one doc has degree >= 1
    assert any(d >= 1 and n > 0 for d, n in by_deg.items())


def test_zipf_fit_matches_python_replay(spark, sf_dir):
    from collections import Counter

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    row = QUERIES["q_zipf_fit"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = Counter()
    for r in docs.select(t.tokens("text").alias("toks")).collect():
        counts.update(r["toks"])
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    n = len(top)
    sx = sum(_dec18(math.log2(float(r))) for r in range(1, n + 1))
    sy = sum(_dec18(math.log2(float(c))) for _, c in top)
    sxy = sum(
        _dec18(math.log2(float(r)) * math.log2(float(c)))
        for r, (_, c) in enumerate(top, 1)
    )
    sxx = sum(
        _dec18(math.log2(float(r)) * math.log2(float(r)))
        for r in range(1, n + 1)
    )
    fx, fy, fxy, fxx = (float(v) for v in (sx, sy, sxy, sxx))
    slope = (n * fxy - fx * fy) / (n * fxx - fx * fx)
    intercept = (fy - slope * fx) / n
    assert row["n_points"] == n
    assert row["slope_e6"] == math.floor(slope * 1e6 + 0.5)
    assert row["intercept_e6"] == math.floor(intercept * 1e6 + 0.5)
    # natural-ish corpora slope downward
    assert row["slope_e6"] < 0


def test_corpus_drift_js_bounds_and_totals(spark, sf_dir):
    from collections import Counter
    import hashlib

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    row = QUERIES["q_corpus_drift_js"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sides = Counter()
    vocab = set()
    for r in docs.select("source", t.tokens("text").alias("toks")).collect():
        side = int(hashlib.md5(r["source"].encode()).hexdigest()[:8], 16) % 2
        sides[side] += len(r["toks"])
        vocab.update(r["toks"])
    assert row["n_a"] == sides[0]
    assert row["n_b"] == sides[1]
    assert row["vocab"] == len(vocab)
    # JS divergence in log2 is bounded [0, 1]
    assert 0 <= row["js_e9"] <= 1_000_000_000


def test_dedup_incremental_verdicts_replay(spark, sf_dir):
    """Every reported dup must be a genuine jaccard >= 0.5 pair, and the
    output covers exactly the new-batch ids."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators.dedup import (
        shingles,
    )
    from pyspark.sql import functions as F

    rows = QUERIES["q_dedup_incremental"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_ids = {
        r["doc_id"] for r in docs.filter("doc_id % 7 = 0").select("doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} == new_ids
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select("doc_id", shingles("text", 3).alias("sh")).collect()
    }
    for r in rows:
        if r["is_dup"]:
            a, b = sh[r["doc_id"]], sh[r["match_id"]]
            inter, uni = len(a & b), len(a | b)
            assert 2 * inter >= uni > 0
            assert r["match_id"] % 7 != 0  # matches come from the base only
            assert r["best_jacc_ppm"] >= inter * 1_000_000 // uni >= 500_000
        else:
            assert r["match_id"] == -1 and r["best_jacc_ppm"] == 0
