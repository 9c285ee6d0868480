"""Corpus statistics-release CLI — the sketch family as one runnable job.

``curate_corpus`` selects the data and ``maintain_layout`` keeps its
layout healthy; this job publishes the STATISTICS a dataset release
ships alongside the shards, built so every artifact is either fixed-size
or privacy-noised:

  1. heavy hitters   — Count-Min-Sketch top-k tokens (est + exact +
                       overcount; the sketch is 4×1024 counters whatever
                       the corpus size) → ``heavy_hitters.parquet``
  2. language counts — per-language doc counts released through the
                       truncated discrete-Laplace mechanism (seeded,
                       deterministic); the RELEASE file carries only the
                       noisy values — true counts stay in the run card →
                       ``noisy_lang_counts.parquet``
  3. content bloom   — a Bloom filter over exact-content fingerprints,
                       persisted as the ≤ m/32-row (word, bits) table →
                       ``doc_bloom.parquet``.  This is the STANDING
                       INDEX for incremental admission: tomorrow's shard
                       probes it (sketches.bloom_probe) without
                       rescanning today's corpus, and absorbing the new
                       shard is a word-wise bit-OR merge
                       (q_sketch_merge proves that lossless).
  4. notify          — the terminal-state seam (SNS-email twin)

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.corpus_stats \\
        --docs /root/testdata/sf0.001/documents.parquet --output ./stats \\
        [--topk 20] [--eps 1.0] [--bloom-bits 65536] \\
        [--notify-jsonl state.jsonl]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from ..operators import sketches, text
from ..session import get_spark
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink

_CMS_D, _CMS_W = 4, 1024
_DP_Z = 32
_DP_SEED = "corpus-stats"


def build_stats(
    spark,
    docs_path: str,
    output: str,
    topk: int = 20,
    eps: float = 1.0,
    bloom_bits: int = 1 << 16,
    bloom_k: int = 3,
) -> dict:
    """Run the release pass; returns the accounting card."""
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError(f"no documents under {docs_path!r}")

    # 1. CMS heavy hitters: distinct-token shuffle → fixed-size sketch →
    #    broadcast-scored candidates (one-sided error kept in the file)
    counts = (
        docs.select(F.explode(text.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("exact_n"))
    )
    placed = sketches.cms_place(counts, "token", "exact_n", _CMS_D, _CMS_W)
    cms = sketches.cms_build(placed, "exact_n")
    hitters = (
        placed.join(F.broadcast(cms), ["r", "pos"])
        .groupBy("token")
        .agg(F.min("counter").alias("est_n"), F.min("exact_n").alias("exact_n"))
        .orderBy(F.desc("est_n"), "token")
        .limit(topk)
        .select(
            "token",
            F.col("est_n").cast("long").alias("est_n"),
            F.col("exact_n").cast("long").alias("exact_n"),
            (F.col("est_n") - F.col("exact_n")).cast("long").alias("overcount"),
        )
    )
    hitters.write.mode("overwrite").parquet(f"{output}/heavy_hitters.parquet")

    # 2. DP language counts: the release file carries ONLY noisy values
    lang_true = docs.groupBy("lang").agg(F.count("*").alias("true_n"))
    noise = sketches.dp_noise("lang", eps, _DP_Z, seed=_DP_SEED)
    noisy = lang_true.select(
        "lang", (F.col("true_n") + noise).cast("long").alias("noisy_n")
    )
    noisy.write.mode("overwrite").parquet(f"{output}/noisy_lang_counts.parquet")
    true_counts = {r.lang: r.true_n for r in lang_true.collect()}  # bounded: |langs|

    # 3. standing content bloom: fingerprints → (word, bits) table
    fps = docs.select(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp")
    ).distinct()
    n_distinct = fps.count()
    bloom = sketches.bloom_build(fps, "fp", bloom_bits, bloom_k)
    bloom.write.mode("overwrite").parquet(f"{output}/doc_bloom.parquet")
    n_words = spark.read.parquet(f"{output}/doc_bloom.parquet").count()

    card = {
        "n_docs": n_docs,
        "n_distinct_fingerprints": n_distinct,
        "topk": topk,
        "eps": eps,
        "bloom_bits": bloom_bits,
        "bloom_words": n_words,
        "true_lang_counts": true_counts,  # card-internal; NOT in the release
    }
    print("stats card: " + json.dumps(card, sort_keys=True))
    return card


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="corpus statistics release")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="release output dir")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--eps", type=float, default=1.0, help="DP epsilon")
    p.add_argument("--bloom-bits", type=int, default=1 << 16)
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
        spark = get_spark(app_name="corpus-stats")
        return build_stats(
            spark,
            args.docs,
            args.output,
            topk=args.topk,
            eps=args.eps,
            bloom_bits=args.bloom_bits,
        )

    run_with_notification(
        "corpus-stats",
        _run,
        notifier,
        detail={"docs": args.docs, "output": args.output},
    )


if __name__ == "__main__":
    main()
