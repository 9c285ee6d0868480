"""Round-3 evidence queries (queries_ext15): behavioral assertions beyond
the oracle hash — contract edges the SQL replay alone wouldn't explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_taxi_star_deterministic_contract(spark, sf_dir):
    rows = QUERIES["q_taxi_star_deterministic"](spark, sf_dir).collect()
    # 200 base trips (dups collapsed) + the Y-flag survivor; all six
    # quality-filter victims gone
    assert len(rows) == 201
    assert all(1 <= r.passenger_count <= 6 for r in rows)
    assert all(5.0 <= r.trip_distance <= 500.0 for r in rows)
    assert all(r.trip_duration_minutes < 1440 for r in rows)
    assert all(r.trip_peak_band_id in ("101", "102", "103") for r in rows)
    y = [r for r in rows if r.store_and_fwd_flag == 1]
    assert len(y) == 1 and y[0].airport_fee == 1.25


def test_taxi_star_deterministic_matches_uuid_lane(spark, sf_dir):
    # the deterministic projection must agree with the full fact build
    # (minus trip_id) — same pipeline, one column narrower.  The uuid
    # variant is undeclared (it could never hash-match), so THIS test is
    # its correctness evidence: row-identical modulo trip_id, and the
    # uuid PK itself is unique per row.
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import q_taxi_star_build

    det = QUERIES["q_taxi_star_deterministic"](spark, sf_dir)
    full_with_pk = q_taxi_star_build(spark, sf_dir)
    n = full_with_pk.count()
    assert full_with_pk.select("trip_id").distinct().count() == n
    full = full_with_pk.drop("trip_id")
    cast_cols = [
        c for c, t in det.dtypes if t == "double"
    ]
    full = full.select(
        *[F.col(c).cast("double").alias(c) if c in cast_cols else F.col(c) for c in det.columns]
    )
    assert det.exceptAll(full).count() == 0
    assert full.exceptAll(det).count() == 0


def test_ann_lsh_oracle_ranks_and_recall_shape(spark, sf_dir):
    rows = QUERIES["q_ann_lsh_oracle"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        sims = [r.cosine_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != qid for r in rs)


def test_multimodal_resize_bounds(spark, sf_dir):
    rows = QUERIES["q_multimodal_resize"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    assert all(r.width == 64 and r.height == 32 for r in rows)
    assert all(1 <= r.n_bytes <= 32 for r in rows)


def test_dedup_cross_source_key_ordering(spark, sf_dir):
    rows = QUERIES["q_dedup_cross_source"](spark, sf_dir).collect()
    for r in rows:
        assert r.src_a <= r.src_b
        assert r.n_clusters <= r.n_dup_pairs


def test_doc_logprob_is_negative_and_total(spark, sf_dir):
    rows = QUERIES["q_doc_logprob"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    # a probability's log2 is <= 0; equality only if a doc's every token
    # fills the whole corpus
    assert all(r.mean_logprob <= 0 for r in rows)
