"""Scale rehearsal: dedup/ANN path at sf0.1 vs a generated sf1.

SCALE.md claims the banded dedup and LSH-ANN paths grow sub-quadratically
because candidate generation is bucket-bounded, never all-pairs.  This
measures that once past the driver's largest shipped SF (VERDICT r3 item
10): wall-times for the three standing-index queries plus the LSH
collision profile (candidate pairs, verified pairs, largest band bucket)
at both scales.

    python tools/gen_scale_data.py /tmp/sg_sf1 --docs 50000 --vectors 20000
    python tools/scale_rehearsal.py /root/testdata/sf0.1 /tmp/sg_sf1

Prints one JSON object per sf dir plus a growth summary.  Candidate
growth ~n (duplicate density held constant by the generator) and
query wall-time well under the 100x a quadratic stage would show at
10x rows is the pass bar.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import dedup
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES
from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark

REHEARSAL_QUERIES = (
    "q_minhash_dedup_oracle",
    "q_dedup_incremental",
    "q_ann_lsh_oracle",
    # round-4 retrieval stack: BM25 tokenize + dense cosine + fusion
    "q_hybrid_retrieval",
    "q_contrastive_pairs",
    # corpus-wide text-dedup passes (K-gram / shingle-DF shuffles —
    # shuffle volume scales with corpus tokens, the heaviest text path)
    "q_substr_dedup",
    "q_boilerplate_ratio",
    "q_line_dedup",
    # round-5 curation lanes: DSIR hashed-bucket shuffle + the
    # unigram-LM tercile cut (tokenize-dominated corpus passes)
    "q_dsir_weights",
    "q_ccnet_buckets",
)


def profile_sf(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    # collision profile on the production lane (xxhash64, 32 hashes /
    # 8 bands, 3-shingles, tau=0.6 — minhash_dedup_pairs defaults)
    sigs = dedup.minhash_signatures(docs).cache()
    sigs.count()
    cands = dedup.minhash_lsh_candidates(sigs)
    n_cands = cands.count()
    n_pairs = dedup.minhash_dedup_pairs(docs).count()
    max_bucket = (
        dedup.banded_keys(sigs)
        .groupBy("band_idx", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    sigs.unpersist()

    times = {}
    for name in REHEARSAL_QUERIES:
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 2)

    return {
        "sf_dir": sf_dir,
        "docs": n_docs,
        "vectors": n_vecs,
        "lsh_candidate_pairs": n_cands,
        "verified_pairs": n_pairs,
        "max_band_bucket": max_bucket,
        "times_sec": times,
    }


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sg_sf1"]
    spark = get_spark(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    results = [profile_sf(spark, d) for d in dirs]
    for r in results:
        print(json.dumps(r))
    if len(results) == 2 and results[0]["docs"]:
        a, b = results
        ratio = b["docs"] / a["docs"]
        print(
            json.dumps(
                {
                    "row_growth": round(ratio, 2),
                    "candidate_growth": round(
                        b["lsh_candidate_pairs"] / max(a["lsh_candidate_pairs"], 1), 2
                    ),
                    "quadratic_would_be": round(ratio * ratio, 2),
                    "time_growth": {
                        k: round(b["times_sec"][k] / max(a["times_sec"][k], 1e-9), 2)
                        for k in b["times_sec"]
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
