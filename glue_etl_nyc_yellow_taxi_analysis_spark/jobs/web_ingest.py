"""Web-ingest CLI — the crawl on-ramp as one runnable job.

``curate_corpus`` dedups and quality-filters CONTENT; this job runs the
stages a web corpus passes BEFORE content ever matters, composing the
ext30 operator lanes end to end:

  1. URL dedup      — canonicalize each doc's URL
                      (``queries_ext30.canonical_url``: lowercase host,
                      strip :443/fragment/trailing-slash/utm_*, sort
                      params) and keep ONE doc per canonical form
                      (smallest doc_id — the deterministic survivor
                      rule every dedup lane here uses).
  2. topic routing  — ``queries_ext30.keyword_tags`` against the
                      broadcast dictionary; a doc's PRIMARY topic (first
                      tag, or 'untagged') becomes its output partition.
  3. budget packing — per-source longest-first admission under a
                      running token budget (the q_token_budget_pack
                      window), so every source lands within its token
                      quota.
  4. write + card   — admitted docs partitioned by primary topic,
                      exact removal accounting printed as the run card,
                      terminal-state notification (the SNS-email seam).

Every stage is a keyed shuffle or a map stage — URL dedup shuffles on
the canonical key, packing windows on source; nothing global, nothing
driver-side beyond the bounded card aggregates.

    python -m glue_etl_nyc_yellow_taxi_analysis_spark.jobs.web_ingest \\
        --docs /root/testdata/sf0.001/documents.parquet --output ./web \\
        [--budget 1000] [--notify-jsonl state.jsonl]

Input docs may carry their own ``url`` column; the synthetic corpus has
none, so the job plants the deterministic messy URL per doc
(``queries_ext30._messy_url`` — the plant-then-process pattern) to keep
the pipeline runnable end to end on driver testdata.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import text
from ..session import get_spark
from .notify import JobNotifier, jsonl_sink, run_with_notification, stderr_sink


def run_ingest(spark, docs_path: str, output: str, budget: int = 1000) -> dict:
    """Run the on-ramp; returns the accounting card."""
    # enter through the registry module FIRST: queries_ext30 and
    # .queries import each other (registry wiring), so the ext module
    # must never be the cycle's entry point
    from .. import queries as _queries  # noqa: F401
    from ..queries_ext30 import _messy_url, canonical_url, keyword_tags
    docs = spark.read.parquet(docs_path)
    n_in = docs.count()
    if n_in == 0:
        raise ValueError(f"no documents under {docs_path!r}")

    # 1. URL dedup: one survivor per canonical URL (docs with a NULL
    #    URL have nothing to dedup on — they pass through untouched)
    url = F.col("url") if "url" in docs.columns else _messy_url()
    with_url = docs.withColumn("canonical_url", canonical_url(url))
    w_url = Window.partitionBy("canonical_url").orderBy("doc_id")
    survivors = (
        with_url.withColumn(
            "__rk",
            F.when(F.col("canonical_url").isNull(), F.lit(1)).otherwise(
                F.row_number().over(w_url)
            ),
        )
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )

    # 2. topic routing: primary tag = first fired topic, else 'untagged'
    tagged = survivors.withColumn(
        "primary_topic",
        F.coalesce(
            # F.get, not element_at: ANSI element_at RAISES on the empty
            # array an untagged doc produces; get returns NULL
            F.get(keyword_tags(text.tokens("text")), 0),
            F.lit("untagged"),
        ),
    )

    # 3. per-source token-budget admission (longest first, doc_id
    #    tiebreak) — the two-phase keyed_running_sum, not a bare
    #    per-source window (which single-tasks the hottest domain);
    #    coalesce(−n_chars, 2⁶²) ascending == n_chars DESC NULLS LAST
    from ..operators.indexing import keyed_running_sum

    tok = F.coalesce(text.token_count("text").cast("bigint"), F.lit(0))
    packed = keyed_running_sum(
        tagged.withColumn("__tok", tok).withColumn(
            "__ord", F.coalesce(-F.col("n_chars").cast("bigint"), F.lit(2**62))
        ),
        ["source"],
        "__ord",
        "__tok",
        out_col="__cum",
        tiebreak_cols=["doc_id"],
    ).drop("__ord")
    admitted = packed.filter(F.col("__cum") <= budget)

    # 4. write partitioned by primary topic + exact accounting
    #    (drop BOTH window internals — __tok is still needed below for
    #    the accounting aggregate, so drop only on the write branch)
    out_path = f"{output}/corpus"
    admitted.drop("__cum", "__tok").write.mode("overwrite").partitionBy(
        "primary_topic"
    ).parquet(out_path)

    n_survivors = survivors.count()
    acc = admitted.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("__tok"), F.lit(0)).alias("tok"),
    ).collect()[0]
    topics = {
        r["primary_topic"]: r["n"]
        for r in spark.read.parquet(out_path)
        .groupBy("primary_topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }  # bounded: |topics| + 1

    card = {
        "n_docs_in": n_in,
        "n_url_dups_removed": n_in - n_survivors,
        "n_budget_dropped": n_survivors - acc["n"],
        "n_admitted": acc["n"],
        "tok_admitted": int(acc["tok"]),
        "budget_per_source": budget,
        "topic_counts": topics,
    }
    print("ingest card: " + json.dumps(card, sort_keys=True))
    return card


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="web-crawl ingest on-ramp")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--budget", type=int, default=1000, help="tokens per source")
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
        spark = get_spark(app_name="web-ingest")
        return run_ingest(spark, args.docs, args.output, budget=args.budget)

    run_with_notification(
        "web-ingest",
        _run,
        notifier,
        detail={"docs": args.docs, "output": args.output},
    )


if __name__ == "__main__":
    main()
