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


def test_mmr_rerank_matches_oracle_cte_replay(spark, sf_dir):
    """Replay the greedy MMR loop through the INDEPENDENT DuckDB
    chained-CTE oracle (separate cosine, separate argmax logic — no code
    shared with the production driver loop, the r5 advisory's fix for
    the tautological same-helper replay) and require identical
    selections and scores."""
    import duckdb

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext25 import _MMR_K

    got = QUERIES["q_mmr_rerank"](spark, sf_dir).collect()
    assert [r.sel_rank for r in got] == list(range(1, _MMR_K + 1))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    oracle = sorted(con.execute(ORACLE["q_mmr_rerank"]).fetchall())
    assert sorted((r.sel_rank, r.vec_id, r.mmr_score_e6) for r in got) == oracle


def test_mmr_rerank_fails_soft_on_tiny_corpus(spark, tmp_path):
    """A corpus with fewer than _MMR_K rankable candidates (including a
    zero-norm vector whose cosine is NULL) must yield a short, valid
    selection instead of a driver TypeError (r5 advisory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext25 import _MMR_K

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # the query vector
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero-norm → NULL cosine
        (3, [0.5, 0.5, 0.0, 0.0]),
    ]
    t = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    rows = QUERIES["q_mmr_rerank"](spark, str(tmp_path)).collect()
    assert 0 < len(rows) < _MMR_K
    assert [r.sel_rank for r in rows] == list(range(1, len(rows) + 1))
    assert 2 not in {r.vec_id for r in rows}  # NULL-cosine row dropped


def test_rag_context_pack_prefix_budget(spark, sf_dir):
    """Packing must be a greedy prefix of the fusion order: running
    totals are exact prefix sums and the admission verdict is monotone."""
    rows = sorted(
        QUERIES["q_rag_context_pack"](spark, sf_dir).collect(),
        key=lambda r: r.ctx_rank,
    )
    assert [r.ctx_rank for r in rows] == list(range(1, 11))
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.packed == (cum <= 300)
    packed_flags = [r.packed for r in rows]
    assert packed_flags == sorted(packed_flags, reverse=True)  # prefix
    assert packed_flags[0]  # top-ranked doc always fits a sane budget
    # fused order matches q_hybrid_retrieval
    fused = QUERIES["q_hybrid_retrieval"](spark, sf_dir).collect()
    order = [r.doc_id for r in sorted(fused, key=lambda r: (-r.rrf_e8, r.doc_id))]
    assert [r.doc_id for r in rows] == order


def test_contrastive_pairs_numpy_replay(spark, sf_dir):
    """Per anchor: exactly one same-label positive and three
    different-label hard negatives, matching a numpy replay of the
    rounded-cosine e6 lane."""
    import numpy as np

    rows = QUERIES["q_contrastive_pairs"](spark, sf_dir).collect()
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.query_id, []).append(r)
    assert set(by_anchor) == {0, 1, 2}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in emb}
    for qid, got in by_anchor.items():
        qv, qlab = vecs[qid]
        scored = []
        for vid, (v, lab) in vecs.items():
            if vid == qid:
                continue
            cos = float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv)))
            e6 = int(np.floor(round(cos, 6) * 1000000 + 0.5))
            scored.append((vid, lab == qlab, e6))
        exp_pos = sorted(
            [s for s in scored if s[1]], key=lambda s: (-s[2], s[0])
        )[:1]
        exp_neg = sorted(
            [s for s in scored if not s[1]], key=lambda s: (-s[2], s[0])
        )[:3]
        got_pos = [(r.vec_id, r.cos_e6) for r in got if r.role == "pos"]
        got_neg = [
            (r.vec_id, r.cos_e6)
            for r in sorted(got, key=lambda r: r.rank)
            if r.role == "neg"
        ]
        assert got_pos == [(v, e) for v, _, e in exp_pos]
        assert got_neg == [(v, e) for v, _, e in exp_neg]


def test_batch_padding_plan_exact_accounting(spark, sf_dir):
    """Bucket assignment, batch counts and waste must replay exactly
    from the raw token counts."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext25 import _BPP_LADDER

    rows = {r.bucket_len: r for r in QUERIES["q_batch_padding_plan"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    import re
    from collections import defaultdict

    buckets = defaultdict(lambda: [0, 0])  # bucket -> [n_docs, real_tokens]
    for d in docs:
        n = len([t for t in re.split(r"[^a-z0-9]+", d.text.lower()) if t])
        if n == 0:
            continue
        b = next((w for w in _BPP_LADDER if n <= w), n)  # beyond-ladder: exact fit
        buckets[b][0] += 1
        buckets[b][1] += n
    assert set(rows) == set(buckets)
    for b, (nd, real) in buckets.items():
        r = rows[b]
        assert r.n_docs == nd and r.real_tokens == real
        assert r.n_batches == (nd + 31) // 32
        assert r.padded_tokens == nd * b
        assert r.waste_ppm == (nd * b - real) * 1000000 // (nd * b)
        assert 0 <= r.waste_ppm < 1000000  # padded >= real, always some content


def test_silhouette_bounds_and_rep_identity(spark, sf_dir):
    """Silhouettes live in [-1, 1] (e6 lane), every point is assigned,
    and each label's representative scores exactly +1 (distance to its
    own rep is 0), which pins the rep wiring."""
    rows = QUERIES["q_silhouette"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert sum(r.n_points for r in rows) == emb.count()
    assert len(rows) == emb.select("label").distinct().count()
    for r in rows:
        assert -1000000 <= r.min_sil_e6 <= r.mean_sil_e6 <= r.max_sil_e6 <= 1000000
        assert r.max_sil_e6 == 1000000  # the rep itself


def test_dedup_threshold_sweep_reconciles(spark, sf_dir):
    """Buckets respect the verify floor, the cumulative column is the
    suffix sum, and the high-threshold tail agrees with the τ=0.5
    production count (both filter the same raw-jaccard pair set)."""
    rows = sorted(
        QUERIES["q_dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: -r.tau_tenths,
    )
    assert rows and all(r.tau_tenths >= 3 for r in rows)
    cum = 0
    for r in rows:
        cum += r.n_pairs
        assert r.n_pairs_at_or_above == cum
    at_or_above_5 = sum(r.n_pairs for r in rows if r.tau_tenths >= 5)
    oracle_pairs = QUERIES["q_minhash_dedup_oracle"](spark, sf_dir).count()
    # identical pipeline and params; rounding at the 0.5 boundary can
    # shift a pair by one bucket at most
    assert abs(at_or_above_5 - oracle_pairs) <= 1


def test_hybrid_final_carve_is_top_k(spark, sf_dir):
    """The final fusion carve must compile to TakeOrderedAndProject
    (per-partition top-k), never a global sort."""
    plan = QUERIES["q_hybrid_retrieval"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
