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
