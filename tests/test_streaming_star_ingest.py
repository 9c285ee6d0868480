"""End-to-end incremental ingest: files arrive → star fact appears in the
catalog, month-partitioned; re-delivering a month replaces (not duplicates)
its partition; a newly arriving month is picked up from the checkpoint."""

import os
import shutil
import tempfile
from urllib.parse import urlparse

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark import catalog
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import _taxi_fixture
from glue_etl_nyc_yellow_taxi_analysis_spark.streaming.ingest import monthly_star_ingest


def test_monthly_star_ingest_end_to_end(spark):
    db = "sg_test_stream_star"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{db}.db", ignore_errors=True)

    raw = _taxi_fixture(spark)
    src = tempfile.mkdtemp(prefix="sg_ingest_src_")
    ckpt = tempfile.mkdtemp(prefix="sg_ingest_ckpt_")

    def drop_month(df, name):
        tmp = tempfile.mkdtemp(prefix="sg_ingest_tmp_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(f"{tmp}/{part}", f"{src}/{name}")

    # month 1 arrives
    drop_month(raw, "yellow_tripdata_2021-01.parquet")
    q = monthly_star_ingest(spark, src, db, raw.schema, ckpt)
    q.awaitTermination()
    fact = catalog.read_table(spark, db, "fact_uber_trips")
    assert fact.filter("processed_month = '1'").count() == 201

    # month 2 arrives later: checkpoint resumes, month 1 untouched
    drop_month(raw.withColumn(
        "tpep_pickup_datetime", F.col("tpep_pickup_datetime") + F.expr("interval 31 days")
    ).withColumn(
        "tpep_dropoff_datetime", F.col("tpep_dropoff_datetime") + F.expr("interval 31 days")
    ), "yellow_tripdata_2021-02.parquet")
    q = monthly_star_ingest(spark, src, db, raw.schema, ckpt)
    q.awaitTermination()
    fact = catalog.read_table(spark, db, "fact_uber_trips")
    by_month = {r.processed_month: r.n for r in fact.groupBy("processed_month").agg(F.count("*").alias("n")).collect()}
    assert by_month == {"1": 201, "2": 201}

    # partition pruning on read-back: month filter touches one directory
    files = {
        r[0]
        for r in fact.filter("processed_month = '2'")
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert files and all("processed_month=2" in f for f in files)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
