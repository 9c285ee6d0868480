"""Privacy audit + streaming curation (queries_ext17): behavioral
assertions beyond the oracle hash."""

from __future__ import annotations

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_kanonymity_ladder_monotone(spark, sf_dir):
    rows = {r.level: r for r in QUERIES["q_kanonymity"](spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2}
    # generalizing merges groups: group count shrinks, risk never grows
    assert rows[0].n_groups >= rows[1].n_groups >= rows[2].n_groups
    assert rows[0].n_risk_rows >= rows[1].n_risk_rows >= rows[2].n_risk_rows
    assert all(r.n_small_groups <= r.n_groups for r in rows.values())
    assert all(r.n_risk_rows <= 5 * r.n_small_groups for r in rows.values())
    # the audit must actually FIRE at the finest level on this corpus
    assert rows[0].n_small_groups > 0


def test_stream_quality_filter_matches_batch(spark, sf_dir):
    stream = {
        r.source: r
        for r in QUERIES["q_stream_quality_filter"](spark, sf_dir).collect()
    }
    batch = {
        r.source: r for r in QUERIES["q_quality_classifier"](spark, sf_dir)
        .groupBy("source")
        .agg(
            {"doc_id": "count", "keep": "sum", "logit_centi": "sum"},
        )
        .withColumnRenamed("count(doc_id)", "n_docs")
        .withColumnRenamed("sum(keep)", "n_keep")
        .withColumnRenamed("sum(logit_centi)", "sum_logit_centi")
        .collect()
    }
    assert set(stream) == set(batch)
    for src, s in stream.items():
        b = batch[src]
        assert (s.n_docs, s.n_keep, s.sum_logit_centi) == (
            b.n_docs,
            b.n_keep,
            b.sum_logit_centi,
        )
