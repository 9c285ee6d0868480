"""Behavioral tests for the round-3 fourth-pass batch (queries_ext19)."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_global_shuffle_partitions_corpus_and_is_bit_stable(spark, sf_dir):
    rows = QUERIES["q_global_shuffle"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    assert len({r["shard"] for r in rows}) == len(rows)
    # the checksum verifies POSITIONS: two runs must agree exactly
    base = {r["shard"]: r["order_checksum"] for r in rows}
    rows2 = QUERIES["q_global_shuffle"](spark, sf_dir).collect()
    assert {r["shard"]: r["order_checksum"] for r in rows2} == base


def test_global_shuffle_matches_python_replay(spark, sf_dir):
    import hashlib

    tab = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    key = {d: hashlib.md5(str(d).encode()).hexdigest() for d in tab["doc_id"]}
    shard = {d: int(key[d][:8], 16) % 8 for d in tab["doc_id"]}
    expect = {}
    for s in set(shard.values()):
        docs = sorted(
            (d for d in tab["doc_id"] if shard[d] == s),
            key=lambda d: (key[d], d),
        )
        expect[s] = {
            "n_docs": len(docs),
            "head_doc_id": docs[0],
            "order_checksum": sum(
                (i + 1) * (d % 1000003) for i, d in enumerate(docs)
            ),
        }
    for r in QUERIES["q_global_shuffle"](spark, sf_dir).collect():
        e = expect[r["shard"]]
        assert r["n_docs"] == e["n_docs"]
        assert r["head_doc_id"] == e["head_doc_id"]
        assert r["order_checksum"] == e["order_checksum"]


def test_dedup_recall_bounds_and_planted_dups(spark, sf_dir):
    row = QUERIES["q_dedup_recall"](spark, sf_dir).collect()[0]
    # the generator plants near-dup pairs, so ground truth is non-empty
    assert row["n_truth"] > 0
    assert 0 <= row["n_hit"] <= row["n_cand"]
    assert row["n_hit"] <= row["n_truth"]
    assert 0 <= row["recall_ppm"] <= 1_000_000
    assert 0 <= row["precision_ppm"] <= 1_000_000
    assert row["recall_ppm"] == row["n_hit"] * 1_000_000 // row["n_truth"]
    # k=12/b=4 banding at tau=0.5 should catch most planted dups
    assert row["recall_ppm"] >= 500_000


def test_embedding_dim_stats_matches_numpy(spark, sf_dir):
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    mat = np.array(tab["embedding"], dtype=np.float32).astype(np.float64)
    ve4 = np.floor(mat * 1e4 + 0.5).astype(np.int64)
    rows = {r["dim"]: r for r in QUERIES["q_embedding_dim_stats"](spark, sf_dir).collect()}
    assert set(rows) == set(range(mat.shape[1]))
    for d in range(mat.shape[1]):
        col = ve4[:, d]
        n = len(col)
        s, ss = int(col.sum()), int((col * col).sum())
        r = rows[d]
        assert r["n"] == n
        assert r["mean_e4"] == math.floor(s / n)
        assert r["var_e8"] == math.floor((n * ss - s * s) / (n * n))
        assert r["min_e4"] == int(col.min())
        assert r["max_e4"] == int(col.max())


def test_pmi_bigrams_matches_python_replay(spark, sf_dir):
    """Replay PMI in pure python over the engine's own token lane."""
    from collections import Counter

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    rows = QUERIES["q_pmi_bigrams"](spark, sf_dir).collect()
    assert rows, "PMI query returned nothing"
    full_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full_tok_lists = [
        r["toks"] for r in full_docs.select(t.tokens("text").alias("toks")).collect()
    ]
    c2, cl, cr = Counter(), Counter(), Counter()
    for toks in full_tok_lists:
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
            cl[a] += 1
            cr[b] += 1
    n_total = sum(c2.values())
    for r in rows[:50]:
        pair = (r["w1"], r["w2"])
        assert c2[pair] == r["c2"]
        assert r["c2"] >= 5
        pmi = (
            math.log2(c2[pair])
            + math.log2(n_total)
            - math.log2(cl[pair[0]])
            - math.log2(cr[pair[1]])
        )
        assert r["pmi_e4"] == math.floor(pmi * 1e4 + 0.5)
    # completeness: every pair at/above min support is emitted
    assert len(rows) == sum(1 for v in c2.values() if v >= 5)
