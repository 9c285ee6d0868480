"""Behavioral tests for the round-3 third-pass batch (queries_ext18)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.dedup import (
    containment_pairs,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.similarity import (
    pca_power_exact,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_train_split_partition_is_total_and_disjoint(spark, sf_dir):
    rows = QUERIES["q_train_split"](spark, sf_dir).collect()
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # bucket < 80 / < 90 / else is structurally total and disjoint: every
    # doc lands in exactly one split
    assert sum(r["n_docs"] for r in rows) == total_docs
    # the md5 carve should land near 80/10/10
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert by_split["train"] / total_docs == pytest.approx(0.8, abs=0.08)


def test_containment_detects_full_quote(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # doc 2 quotes doc 1 whole and adds two words: every 3-shingle
            # of doc 1 appears in doc 2, so containment(1 -> 2) must be 1.0
            (
                2,
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            ),
            (3, "completely different words about another topic entirely"),
        ],
        "doc_id int, text string",
    )
    # singleton bands (8 of 8): docs 1 and 2 collide iff ANY minhash
    # minimum lands in the shared shingles — md5 is fixed, so this is
    # deterministic, and with 6 of 8 shingles shared it does
    pairs = {
        (r["src_id"], r["dst_id"]): r["containment_ppm"]
        for r in containment_pairs(
            df, num_hashes=8, bands=8, tau_ppm=0
        ).collect()
    }
    assert pairs.get((1, 2)) == 1_000_000
    # the reverse direction is partial: doc 2 has strictly more shingles
    assert 0 < pairs[(2, 1)] < 1_000_000
    assert not any(3 in k for k in pairs)


def test_containment_query_directed_and_thresholded(spark, sf_dir):
    rows = QUERIES["q_containment_dedup"](spark, sf_dir).collect()
    assert rows, "corpus has near-dup pairs; containment must surface them"
    for r in rows:
        assert r["containment_ppm"] >= 300_000
        assert r["containment_ppm"] == r["inter"] * 1_000_000 // r["n_src"]
        assert r["src_id"] != r["dst_id"]


def test_pca_power_matches_numpy_replay(spark, sf_dir):
    out = {
        r["dim"]: (r["loading_e9"], r["eigval_e6"])
        for r in QUERIES["q_pca_power"](spark, sf_dir).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    v = np.ones(X.shape[1])
    for _ in range(3):
        s = X.T @ (X @ v)
        n = np.sqrt((s * s).sum())
        v = s / n
    assert len(out) == X.shape[1]
    for d in range(X.shape[1]):
        # decimal-exact vs numpy float sums differ at ~1e-12 of a unit
        # vector — far inside a 1e-7 (100-ppb) tolerance
        assert abs(out[d][0] - round(v[d] * 1e9)) <= 100, d
    assert out[0][1] == pytest.approx(n * 1e6, abs=1000)


def test_pca_power_bit_stable_under_repartitioning(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, pca_power_exact(emb, iters=2).collect()))
    b = sorted(
        map(tuple, pca_power_exact(emb.repartition(7), iters=2).collect())
    )
    assert a == b  # decimal-summed update: exact under any partitioning


def test_compaction_plan_bin_math(spark, sf_dir):
    rows = QUERIES["q_compaction_plan"](spark, sf_dir).collect()
    li_count = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in rows) == li_count
    for r in rows:
        assert r["n_files"] >= 1
        assert r["rows_per_file"] <= r["n_rows"]
        if r["undersized"]:
            assert r["n_files"] == 1
        # n_files is the ceiling of bytes/target: files are never overfull
        assert r["n_files"] * 65_536 >= r["est_bytes"]
        assert (r["n_files"] - 1) * 65_536 < r["est_bytes"]


def test_quality_calibration_accounts_every_joined_doc(spark, sf_dir):
    rows = QUERIES["q_quality_calibration"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == min(emb, docs)
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["mean_label_milli"] == r["sum_label"] * 1000 // r["n_docs"]


def test_doc_ppl_bigram_scores_every_doc_nonpositive(spark, sf_dir):
    rows = QUERIES["q_doc_ppl_bigram"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs  # every doc has ≥ 2 tokens in the corpus
    for r in rows:
        # add-1 smoothing: c(w1,w2)+1 ≤ c(w1·)+V always, so lp ≤ 0
        assert r["mean_lp_e4"] <= 0
        assert r["n_bigrams"] >= 1
