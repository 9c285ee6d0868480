"""Round-12 q_semdedup adjudication probe (VERDICT item 1).

Three assignment variants, identical outputs by construction:

* window    — the r10 form: row_number() over (vec_id) on the corpus x
              reps cross join (WindowGroupLimit-eligible in Spark 3.5+).
* minstruct — the r11 form: groupBy(vec_id).agg(min(struct(-cos, ...)),
              first(embedding)) (SortAggregate: struct buffers are not
              hash-aggregable).
* arraymin  — reps folded into ONE broadcast array row, per-row
              array_min over a transform (zero exchange, zero sort on
              the corpus side — the queries_ext49 IVF pattern).

Usage:
    python tools/semdedup_ab.py [--sf-dir DIR] [--repeat N] [--plans]

Interleaves the variants round-robin (guide §1: ambient load hits all
variants equally), prints per-run seconds, and with --plans dumps the
PRE-checkpoint assignment subtree's formatted plan to plans/r12/.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import similarity
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext16 import _SD_TARGET, _SD_TAU
from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark


def _reps(emb):
    wlab = Window.partitionBy("label")
    return (
        emb.withColumn("cnt", F.count(F.lit(1)).over(wlab))
        .withColumn("rep_rn", F.row_number().over(wlab.orderBy("vec_id")))
        .filter(F.col("rep_rn") <= F.greatest(F.lit(1), F.expr(f"cnt div {_SD_TARGET}")))
        .select(
            F.col("label").alias("cluster"),
            F.col("vec_id").alias("rep_id"),
            F.col("embedding").alias("centroid"),
        )
    )


def assign_window(emb):
    reps = _reps(emb)
    cos_rep = F.round(similarity.cosine(F.col("embedding"), F.col("centroid")), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_rep"), F.col("cluster"), F.col("rep_id")
    )
    return (
        emb.crossJoin(F.broadcast(reps))
        .select("vec_id", "embedding", "cluster", "rep_id", cos_rep.alias("cos_rep"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "embedding", "cluster", "rep_id",
            similarity.l2_norm(F.col("embedding")).alias("nrm"),
        )
    )


def assign_minstruct(emb):
    reps = _reps(emb)
    cos_rep = F.round(similarity.cosine(F.col("embedding"), F.col("centroid")), 6)
    neg_cos = F.when(cos_rep.isNull(), F.lit(float("inf"))).otherwise(-cos_rep)
    return (
        emb.crossJoin(F.broadcast(reps))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    neg_cos.alias("nc"),
                    F.col("cluster").alias("cluster"),
                    F.col("rep_id").alias("rep_id"),
                )
            ).alias("b"),
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id", "embedding",
            F.col("b.cluster").alias("cluster"),
            F.col("b.rep_id").alias("rep_id"),
            similarity.l2_norm(F.col("embedding")).alias("nrm"),
        )
    )


def assign_arraymin(emb):
    reps_arr = _reps(emb).agg(
        F.array_sort(
            F.collect_list(F.struct("cluster", "rep_id", "centroid"))
        ).alias("__rs")
    )

    def neg_cos(vec, nrm, cent):
        c = F.round(
            F.try_divide(similarity.dot(vec, cent), nrm * similarity.l2_norm(cent)),
            6,
        )
        return F.when(c.isNull(), F.lit(float("inf"))).otherwise(-c)

    scored = F.transform(
        F.col("__rs"),
        lambda r: F.struct(
            neg_cos(F.col("embedding"), F.col("nrm"), r["centroid"]).alias("nc"),
            r["cluster"].alias("cluster"),
            r["rep_id"].alias("rep_id"),
        ),
    )
    best = F.array_min(F.col("__scored"))
    return (
        emb.crossJoin(F.broadcast(reps_arr))
        .withColumn("nrm", similarity.l2_norm(F.col("embedding")))
        .withColumn("__scored", scored)
        .withColumn("__best", best)
        .select(
            "vec_id", "embedding",
            F.col("__best.cluster").alias("cluster"),
            F.col("__best.rep_id").alias("rep_id"),
            "nrm",
        )
    )


VARIANTS = {
    "window": assign_window,
    "minstruct": assign_minstruct,
    "arraymin": assign_arraymin,
}


def full_lane(spark, sf_dir, assign_fn):
    emb = _t(spark, sf_dir, "embeddings")
    assigned = assign_fn(emb).localCheckpoint()
    a = assigned.alias("a")
    b = assigned.alias("b")
    pair_cos = F.round(
        F.try_divide(
            similarity.dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.nrm") * F.col("b.nrm"),
        ),
        6,
    )
    dups = (
        a.join(b, (F.col("a.rep_id") == F.col("b.rep_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(pair_cos >= F.lit(_SD_TAU))
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("dup_of").isNotNull(), 1).otherwise(0).alias("is_pruned"),
            "dup_of",
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--variants", default="window,minstruct,arraymin")
    args = ap.parse_args()

    spark = get_spark(app_name="semdedup_ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/codegen outside the timed region
    _t(spark, args.sf_dir, "embeddings").limit(10).write.format("noop").mode("overwrite").save()

    names = args.variants.split(",")
    times = {n: [] for n in names}
    # verify identical outputs once up front
    base = None
    for n in names:
        rows = sorted(
            (tuple(r) for r in full_lane(spark, args.sf_dir, VARIANTS[n]).collect())
        )
        if base is None:
            base = rows
        else:
            assert rows == base, f"variant {n} diverges from {names[0]}"
    print(f"outputs identical across {names} ({len(base)} rows)", flush=True)

    for rep in range(args.repeat):
        for n in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"semdedup_ab:{n}:{rep}")
            t0 = time.time()
            full_lane(spark, args.sf_dir, VARIANTS[n]).write.format("noop").mode(
                "overwrite"
            ).save()
            times[n].append(round(time.time() - t0, 3))
    for n in names:
        runs = times[n][1:] if args.repeat > 2 else times[n]
        print(
            f"{n}: runs={times[n]} min={min(runs)} "
            f"med={sorted(runs)[len(runs) // 2]}",
            flush=True,
        )

    if args.plans:
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r12",
        )
        os.makedirs(plans_dir, exist_ok=True)
        for n in names:
            df = VARIANTS[n](_t(spark, args.sf_dir, "embeddings"))
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"q_semdedup_assign_{n}.txt"), "w"
            ) as f:
                f.write(txt)
        print(f"plans dumped to {plans_dir}", flush=True)


if __name__ == "__main__":
    main()
