"""ANN-index builder CLI — the ext40 PQ pipeline as one runnable job.

A vector corpus at 100 TB is searched through a PERSISTED index, not a
per-query retrain; this job is the build step.  It trains the
per-subspace PQ codebooks on the exact lane (operators/pq.pq_train —
deterministic lowest-id init, decimal centroid sums), encodes every
vector to m one-byte codes, and publishes the artifacts a vector-store
release ships:

  1. codebook        — (sub, cluster, centroid) → ``codebook.parquet``
  2. codes           — (id, sub, code), the 64×-compressed corpus
                       → ``codes.parquet``
  3. recall audit    — hits@k of ADC and ADC+exact-re-rank search vs
                       exact L2 ground truth for the ``--audit-queries``
                       lowest-id vectors (the quality dial a release
                       documents) → ``recall.parquet``
  4. notify          — the terminal-state seam (SNS-email twin)

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.build_ann_index \\
        --vectors /root/testdata/sf0.001/embeddings.parquet --output ./ann \\
        [--m 4] [--k 16] [--iters 2] [--topk 10] [--rerank 100] \\
        [--audit-queries 3] [--notify-jsonl state.jsonl]

Determinism: every stage is the ext40 exact lane — same input,
bit-identical artifacts (asserted by the CLI test, the pretrain_prep /
train_tokenizer standard).  Scale posture: one corpus scan to encode,
(sub × cluster × dim)-cell training shuffles, broadcast-only search
joins; the audit's exact side is corpus × audit-queries, bounded.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import pq
from ..session import get_spark
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink


def build(
    spark,
    vectors_path: str,
    output: str,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    topk: int = 10,
    rerank: int = 100,
    audit_queries: int = 3,
) -> dict:
    """Train + encode + audit; write artifacts; return the card."""
    emb = spark.read.parquet(vectors_path)
    n_vectors = emb.count()
    if n_vectors == 0:
        raise ValueError(f"no vectors under {vectors_path!r}")

    cb = pq.pq_train(emb, m=m, k=k, iters=iters)
    cb.write.mode("overwrite").parquet(f"{output}/codebook.parquet")
    cb = spark.read.parquet(f"{output}/codebook.parquet")

    codes = pq.pq_encode(emb, cb, m=m)
    codes.write.mode("overwrite").parquet(f"{output}/codes.parquet")
    codes = spark.read.parquet(f"{output}/codes.parquet")
    n_codes = codes.count()

    # recall audit: the audit_queries lowest-id vectors as queries
    qids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(audit_queries).collect()
    ]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = pq.pq_adc_topk(
        emb, queries, cb, k=topk, m=m, codes=codes
    ).select("query_id", "vec_id")
    rer = pq.pq_adc_rerank_topk(
        emb, queries, cb, k=topk, r=rerank, m=m
    ).select("query_id", "vec_id")

    qv = F.broadcast(
        queries.select(
            "query_id",
            F.transform("embedding", lambda v: v.cast("double")).alias("qx"),
        )
    )
    scored = (
        emb.select(
            "vec_id",
            F.transform("embedding", lambda v: v.cast("double")).alias("x"),
        )
        .crossJoin(qv)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "d",
            F.aggregate(
                F.zip_with("x", "qx", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "vec_id")
    )
    hits_a = (
        adc.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits_adc"))
    )
    hits_r = (
        rer.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits_rerank"))
    )
    audit = (
        queries.select("query_id")
        .join(hits_a, "query_id", "left")
        .join(hits_r, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits_adc", F.lit(0)).cast("bigint").alias("hits_adc"),
            F.coalesce("hits_rerank", F.lit(0))
            .cast("bigint")
            .alias("hits_rerank"),
            F.lit(topk).cast("int").alias("k"),
        )
    )
    audit.write.mode("overwrite").parquet(f"{output}/recall.parquet")
    audit_rows = {
        int(r["query_id"]): (int(r["hits_adc"]), int(r["hits_rerank"]))
        for r in spark.read.parquet(f"{output}/recall.parquet").collect()
    }  # bounded: audit_queries rows

    card = {
        "n_vectors": n_vectors,
        "m": m,
        "k": k,
        "iters": iters,
        "n_code_rows": n_codes,
        "codebook_cells": spark.read.parquet(
            f"{output}/codebook.parquet"
        ).count(),
        "bytes_per_vector_codes": m,
        "audit": {
            str(q): {"hits_adc": a, "hits_rerank": r, "k": topk}
            for q, (a, r) in sorted(audit_rows.items())
        },
    }
    print("ann index card: " + json.dumps(card, sort_keys=True))
    return card


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="PQ ANN index build")
    p.add_argument("--vectors", required=True, help="embeddings parquet path")
    p.add_argument("--output", required=True, help="artifact output dir")
    p.add_argument("--m", type=int, default=4)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--rerank", type=int, default=100)
    p.add_argument("--audit-queries", type=int, default=3)
    p.add_argument(
        "--notify-jsonl",
        default=None,
        help="append a SUCCEEDED/FAILED terminal-state payload here",
    )
    args = p.parse_args(argv)

    notifier = JobNotifier([stderr_sink])
    if args.notify_jsonl:
        notifier.add(jsonl_sink(args.notify_jsonl))

    def _run() -> dict:
        spark = get_spark(app_name="build-ann-index")
        return build(
            spark,
            args.vectors,
            args.output,
            m=args.m,
            k=args.k,
            iters=args.iters,
            topk=args.topk,
            rerank=args.rerank,
            audit_queries=args.audit_queries,
        )

    run_with_notification(
        "build-ann-index",
        _run,
        notifier,
        detail={"vectors": args.vectors, "output": args.output},
    )


if __name__ == "__main__":
    main()
