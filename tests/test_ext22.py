"""Behavioral tests for the round-3 seventh-pass batch (queries_ext22)."""

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _dec18(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("1e-18"), rounding=ROUND_HALF_UP)


def _token_stream(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return [
        (r["doc_id"], r["source"], list(r["toks"]))
        for r in docs.select(
            "doc_id", "source", t.tokens("text").alias("toks")
        ).collect()
    ]


def test_tokenizer_oov_matches_python_replay(spark, sf_dir):
    stream = _token_stream(spark, sf_dir)
    counts = Counter()
    for _, _, toks in stream:
        counts.update(toks)
    vocab = {
        tok
        for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:512]
    }
    per_src = {}
    for _, src, toks in stream:
        n, oov = per_src.get(src, (0, 0))
        per_src[src] = (n + len(toks), oov + sum(t not in vocab for t in toks))
    rows = QUERIES["q_tokenizer_oov"](spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(per_src)
    for r in rows:
        n, oov = per_src[r["source"]]
        assert (r["n_tokens"], r["n_oov"]) == (n, oov)
        assert r["oov_ppm"] == oov * 1_000_000 // n


def test_heaps_fit_matches_python_replay(spark, sf_dir):
    stream = _token_stream(spark, sf_dir)
    bucket = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 10
        for d, _, _ in stream
    }
    n_toks = Counter()
    first_b = {}
    for d, _, toks in stream:
        b = bucket[d]
        n_toks[b] += len(toks)
        for t in toks:
            first_b[t] = min(first_b.get(t, 10), b)
    new_types = Counter(first_b.values())
    cum_n = cum_v = 0
    pts = []
    for b in range(10):
        cum_n += n_toks[b]
        cum_v += new_types[b]
        pts.append((math.log2(float(cum_n)), math.log2(float(cum_v))))
    n = len(pts)
    sx = float(sum(_dec18(x) for x, _ in pts))
    sy = float(sum(_dec18(y) for _, y in pts))
    sxy = float(sum(_dec18(x * y) for x, y in pts))
    sxx = float(sum(_dec18(x * x) for x, _ in pts))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    row = QUERIES["q_heaps_fit"](spark, sf_dir).collect()[0]
    assert row["n_points"] == n
    assert row["beta_e6"] == math.floor(slope * 1e6 + 0.5)
    assert row["log2k_e6"] == math.floor(intercept * 1e6 + 0.5)
    # vocabulary grows sublinearly: 0 < beta < 1 on any text-like corpus
    assert 0 < row["beta_e6"] < 1_000_000


def test_ann_recall_oracle_bounds_and_consistency(spark, sf_dir):
    rows = QUERIES["q_ann_recall_oracle"](spark, sf_dir).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_ppm"] == r["n_hits"] * 1_000_000 // 10
    # 16 tables x 4 planes should find most true neighbors
    assert sum(r["n_hits"] for r in rows) >= 15
