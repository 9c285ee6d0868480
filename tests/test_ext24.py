"""Behavioral tests for the streaming incremental-dedup capstone."""

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_stream_dedup_incremental_equals_batch(spark, sf_dir):
    """The streaming admission path must reproduce the batch operator
    exactly — same verdicts, matches, and similarity values."""
    batch = {
        r["doc_id"]: tuple(r)
        for r in QUERIES["q_dedup_incremental"](spark, sf_dir).collect()
    }
    stream = {
        r["doc_id"]: tuple(r)
        for r in QUERIES["q_stream_dedup_incremental"](spark, sf_dir).collect()
    }
    assert stream == batch
    # and the planted near-dups mean the stream actually flags something
    assert any(r[1] == 1 for r in stream.values())


def test_stream_dedup_incremental_rerunnable(spark, sf_dir):
    """Second drain in the same session (fresh checkpoint/source dirs)
    must produce identical results — the driver runs queries twice."""
    a = sorted(map(tuple, QUERIES["q_stream_dedup_incremental"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_stream_dedup_incremental"](spark, sf_dir).collect()))
    assert a == b


def test_dedup_index_persist_equals_batch(spark, sf_dir):
    batch = {
        r["doc_id"]: tuple(r)
        for r in QUERIES["q_dedup_incremental"](spark, sf_dir).collect()
    }
    persisted = {
        r["doc_id"]: tuple(r)
        for r in QUERIES["q_dedup_index_persist"](spark, sf_dir).collect()
    }
    assert persisted == batch


def test_dedup_savings_reconciles_with_clusters(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext import (
        q_dedup_clusters,
    )

    clusters = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in q_dedup_clusters(spark, sf_dir).collect()
    }
    rows = {r["band"]: r for r in QUERIES["q_dedup_savings"](spark, sf_dir).collect()}
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) == total_docs
    removed = sum(1 for d, (cid, _) in clusters.items() if d != cid)
    assert sum(r["docs_removed"] for r in rows.values()) == removed
    # band-1 clusters are singletons: nothing removed there
    if 1 in rows:
        assert rows[1]["docs_removed"] == 0
        assert rows[1]["n_clusters"] == rows[1]["n_docs"]
