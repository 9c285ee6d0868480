"""Extended inventory XXV — hybrid retrieval (round 4).

The retrieval stack so far exposes the two classic channels separately:
lexical BM25 (`q_bm25_search`) and dense cosine (`q_similarity_topk` /
the ANN lanes).  Production retrieval for RAG / training-data curation
fuses them; Reciprocal Rank Fusion (Cormack et al.) is the standard
training-free fusion and depends only on RANKS, which makes it exactly
integer-replicable across engines — no score normalization, no floats.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import similarity
from .queries import _COSINE_SQL, _t
from .queries_ext9 import bm25_scores

QUERIES_EXT25 = {}
ORACLE_EXT25 = {}

_RRF_K = 60        # the canonical RRF damping constant
_FUSE_TOPN = 20    # per-channel candidate depth
_FINAL_K = 10


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid lexical+dense retrieval via Reciprocal Rank Fusion: BM25
    top-20 (fixed 3-term query) fused with exact-cosine top-20 (query
    vector = vec_id 0; doc_id ≡ vec_id links the two tables) by
    rrf = Σ 1/(60 + rank), kept in an exact e8 integer lane
    (100000000 div (60+rank) per channel — rank-only math, so the fusion
    is bit-identical on any engine and any partitioning).

    Scale shape: each channel carves its top-N with orderBy+limit
    (TakeOrderedAndProject — per-partition top-k, no global sort), and
    rank assignment happens AFTER the carve on ≤N rows (the unpartitioned
    row_number window only ever sees N=20 rows).  The fusion join and
    final top-k run on 2N rows — measurement-priced at any corpus size.
    A missing channel contributes rank 0 (absent marker) and no score.
    """
    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    lex_top = bm25_scores(d).orderBy(F.desc("bm25"), "doc_id").limit(_FUSE_TOPN)
    w_lex = Window.orderBy(F.desc("bm25"), "doc_id")  # ≤ 20 rows post-carve
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("rank_lex")
    )

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = similarity.cosine_topk(emb, q, k=_FUSE_TOPN).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").cast("long").alias("rank_dense")
    )

    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_lex", F.lit(0)).alias("rank_lex"),
            F.coalesce("rank_dense", F.lit(0)).alias("rank_dense"),
        )
        .withColumn(
            "rrf_e8",
            F.when(
                F.col("rank_lex") > 0,
                F.expr(f"CAST(100000000 AS BIGINT) div ({_RRF_K} + rank_lex)"),
            ).otherwise(F.lit(0).cast("long"))
            + F.when(
                F.col("rank_dense") > 0,
                F.expr(f"CAST(100000000 AS BIGINT) div ({_RRF_K} + rank_dense)"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    return fused.orderBy(F.desc("rrf_e8"), "doc_id").limit(_FINAL_K)


SQL_HYBRID_RETRIEVAL = f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
         AS t(token)
  WHERE t.token != ''
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(CAST(dl AS DOUBLE)) FROM dl) AS avgdl
), qtf AS (
  SELECT * FROM tf WHERE token IN ('spark', 'join', 'fast')
), df AS (
  SELECT token, COUNT(*) AS df FROM qtf GROUP BY 1
), contrib AS (
  SELECT q.doc_id,
         CAST(ROUND(
           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (q.tf * 2.2)
           / (q.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)),
         8) AS DECIMAL(18,8)) AS c
  FROM qtf q
  JOIN df ON q.token = df.token
  JOIN dl d ON q.doc_id = d.doc_id
  CROSS JOIN stats s
), bm AS (
  SELECT doc_id, ROUND(CAST(SUM(c) AS DOUBLE), 4) AS bm25
  FROM contrib GROUP BY doc_id
), lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
           AS rank_lex
  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_FUSE_TOPN})
), qv AS (
  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT e.vec_id,
         {_COSINE_SQL.format(a='e.embedding', b='q.qvec')} AS cosine_sim
  FROM embeddings e, qv q WHERE e.vec_id <> 0
), dense AS (
  SELECT vec_id AS doc_id, CAST(rank AS BIGINT) AS rank_dense FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cosine_sim DESC, vec_id) AS rank
    FROM scored) WHERE rank <= {_FUSE_TOPN}
), fused AS (
  SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
         COALESCE(l.rank_lex, 0) AS rank_lex,
         COALESCE(de.rank_dense, 0) AS rank_dense
  FROM lex l FULL JOIN dense de ON l.doc_id = de.doc_id
)
SELECT doc_id, rank_lex, rank_dense,
       (CASE WHEN rank_lex > 0
             THEN CAST(100000000 AS BIGINT) // ({_RRF_K} + rank_lex)
             ELSE 0 END
        + CASE WHEN rank_dense > 0
               THEN CAST(100000000 AS BIGINT) // ({_RRF_K} + rank_dense)
               ELSE 0 END) AS rrf_e8
FROM fused ORDER BY rrf_e8 DESC, doc_id LIMIT {_FINAL_K}
"""

QUERIES_EXT25["q_hybrid_retrieval"] = q_hybrid_retrieval
ORACLE_EXT25["q_hybrid_retrieval"] = SQL_HYBRID_RETRIEVAL
