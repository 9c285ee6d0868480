"""Round-3 curation operators (queries_ext16): behavioral assertions
beyond the oracle hash — semantic invariants the SQL replay alone would
not explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_semdedup_prune_invariants(spark, sf_dir):
    rows = QUERIES["q_semdedup"](spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n  # every vector gets a verdict
    by_id = {r.vec_id: r for r in rows}
    pruned = [r for r in rows if r.is_pruned == 1]
    kept = [r for r in rows if r.is_pruned == 0]
    assert pruned and kept  # tau is corpus-calibrated: both sides non-empty
    for r in pruned:
        # dup_of is an earlier member of the same assigned cluster
        assert r.dup_of is not None and r.dup_of < r.vec_id
        assert by_id[r.dup_of].cluster == r.cluster
    assert all(r.dup_of is None for r in kept)
    # the lowest-id member of any cluster can never be pruned
    lowest = {}
    for r in rows:
        lowest.setdefault(r.cluster, r.vec_id)
        lowest[r.cluster] = min(lowest[r.cluster], r.vec_id)
    assert all(by_id[v].is_pruned == 0 for v in lowest.values())


def test_line_dedup_accounting(spark, sf_dir):
    out = QUERIES["q_line_dedup"](spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()
    assert all(0 <= r.n_removed <= r.n_segments for r in rows)
    # threshold is corpus-calibrated: some docs lose segments, none loses
    # everything AND the removal is non-trivial overall
    assert any(r.n_removed > 0 for r in rows)
    assert any(r.n_removed == 0 or r.n_removed < r.n_segments for r in rows)
    # a doc with nothing removed reconstructs its own normalized text
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text

    clean = {r.doc_id: r.clean_md5 for r in rows if r.n_removed == 0}
    if clean:
        orig = {
            r.doc_id: r.h
            for r in docs.filter(F.col("doc_id").isin(*clean))
            .select("doc_id", F.md5(text.normalized("text")).alias("h"))
            .collect()
        }
        assert orig == clean


def test_bpe_merge_train_monotone_and_applied(spark, sf_dir):
    rows = sorted(
        QUERIES["q_bpe_merge_train"](spark, sf_dir).collect(),
        key=lambda r: r.it,
    )
    assert [r.it for r in rows] == [1, 2, 3]
    assert all(r.pair_count > 0 for r in rows)
    assert all(len(r.left_sym) >= 1 and len(r.right_sym) >= 1 for r in rows)
    # a merged symbol never re-wins as the identical pair (it was fused)
    assert len({(r.left_sym, r.right_sym) for r in rows}) == 3
    # iteration-1 pair is the corpus argmax over raw characters: both
    # symbols are single characters
    assert len(rows[0].left_sym) == 1 and len(rows[0].right_sym) == 1


def test_bpe_apply_compression_accounting(spark, sf_dir):
    rows = QUERIES["q_bpe_apply"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # merges only ever fuse symbols: chars >= symbols >= words
        assert r.n_chars >= r.n_symbols >= r.n_words
    # the three learned merges must actually fire somewhere
    assert any(r.n_symbols < r.n_chars for r in rows)


def test_quality_classifier_logit_lane(spark, sf_dir):
    rows = QUERIES["q_quality_classifier"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        assert r.logit_centi == -300 + 2 * r.n_tok + 25 * r.n_stop + 8 * r.n_types
        assert r.keep == (1 if r.logit_centi > 0 else 0)
        assert r.n_stop <= r.n_tok and r.n_types <= r.n_tok
    # weights are corpus-calibrated: both verdicts occur
    keeps = {r.keep for r in rows}
    assert keeps == {0, 1}


def test_semdedup_rep_count_scales_with_cluster_size(spark, tmp_path):
    """The r6 scale fix: a label with >= 2x_SD_TARGET members must get
    multiple representatives (sub-clusters stay ~_SD_TARGET wide) while
    small labels keep exactly one — removing the scaling would turn the
    in-cluster pairwise stage quadratic again (27.9x at 10x rows in the
    sf1 rehearsal)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext16 import _SD_TARGET

    rng = np.random.default_rng(7)
    n_big, n_small = 2 * _SD_TARGET + 50, 40
    vecs = rng.normal(0, 0.1, size=(n_big + n_small, 8)).astype(np.float32)
    labels = [0] * n_big + [1] * n_small
    t = pa.table(
        {
            "vec_id": pa.array(range(n_big + n_small), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    rows = QUERIES["q_semdedup"](spark, str(tmp_path)).collect()
    assert len(rows) == n_big + n_small

    # re-derive the rep sets the operator must have used: label 0 gets
    # floor(450/200)=2 reps, label 1 gets max(1, 0)=1
    from pyspark.sql import functions as F

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import similarity

    emb = spark.read.parquet(str(tmp_path / "embeddings.parquet"))
    reps = emb.filter(
        (F.col("label") == 0) & F.col("vec_id").isin([0, 1])
        | (F.col("label") == 1) & (F.col("vec_id") == n_big)
    ).select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("centroid"))
    assigned = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            "vec_id",
            "rep_id",
            F.round(
                similarity.cosine(F.col("embedding"), F.col("centroid")), 6
            ).alias("cs"),
        )
    )
    # each big-label sub-cluster must be NON-EMPTY and smaller than the
    # whole label (i.e. the label really split): check via the nearest-rep
    # assignment over reps {0, 1}
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), "rep_id")
    near = (
        assigned.filter(F.col("rep_id").isin([0, 1]))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("rep_id")
        .count()
        .collect()
    )
    sizes = {r.rep_id: r["count"] for r in near}
    assert set(sizes) == {0, 1}          # both sub-clusters exist
    assert all(0 < s < n_big for s in sizes.values())
