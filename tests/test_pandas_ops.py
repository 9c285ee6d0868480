"""Arrow-batched Python operators: parity with their JVM twins."""

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.pandas_ops import (
    cosine_pandas_udf,
    groupwise_zscore,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.similarity import cosine


def test_pandas_udf_cosine_matches_jvm(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    pairs = emb.alias("a").crossJoin(emb.alias("b")).filter("a.vec_id < b.vec_id")
    cos_py = cosine_pandas_udf()
    out = pairs.select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("jvm"),
        cos_py(F.col("a.embedding"), F.col("b.embedding")).alias("py"),
    ).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r.jvm - r.py) <= 1e-6, (r.ia, r.ib, r.jvm, r.py)


def test_groupwise_zscore_matches_window_twin(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumn(
        "nation_key", F.col("c_nationkey").cast("string")
    )
    got = {
        r.c_custkey: r.zscore
        for r in groupwise_zscore(c, "nation_key", "c_acctbal", "c_custkey").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey")
    exp = {
        r.c_custkey: r.z
        for r in c.select(
            "c_custkey",
            F.when(
                F.stddev_samp("c_acctbal").over(w) > 0,
                F.round(
                    (F.col("c_acctbal") - F.avg("c_acctbal").over(w))
                    / F.stddev_samp("c_acctbal").over(w),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("z"),
        ).collect()
    }
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) <= 2e-6, (k, got[k], exp[k])
