from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_hybrid_rrf_fusion_consistency(spark, sf_dir):
    """The fused ranks must agree with the standalone channels and the
    RRF score must be exactly the integer-lane formula of the ranks."""
    rows = QUERIES["q_hybrid_retrieval"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert len({r.doc_id for r in rows}) == 10
    for r in rows:
        exp = (100000000 // (60 + r.rank_lex) if r.rank_lex else 0) + (
            100000000 // (60 + r.rank_dense) if r.rank_dense else 0
        )
        assert r.rrf_e8 == exp and exp > 0, r
        assert 0 <= r.rank_lex <= 20 and 0 <= r.rank_dense <= 20

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import similarity
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext9 import bm25_scores

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = bm25_scores(d).orderBy(F.desc("bm25"), "doc_id").limit(20).collect()
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(lex)}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense_rank = {
        r.vec_id: r.rank for r in similarity.cosine_topk(emb, q, k=20).collect()
    }
    for r in rows:
        if r.rank_lex:
            assert lex_rank.get(r.doc_id) == r.rank_lex, r
        else:
            assert r.doc_id not in lex_rank
        if r.rank_dense:
            assert dense_rank.get(r.doc_id) == r.rank_dense, r
        else:
            assert r.doc_id not in dense_rank


def test_hybrid_final_carve_is_top_k(spark, sf_dir):
    """The final fusion carve must compile to TakeOrderedAndProject
    (per-partition top-k), never a global sort."""
    plan = QUERIES["q_hybrid_retrieval"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
