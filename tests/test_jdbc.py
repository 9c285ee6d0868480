"""JDBC source/sink — the reference's Job-2 surface, tested end-to-end.

The reference loads the star into PostgreSQL over JDBC
(glue_job_scripts/etl-glue-load-to-postgres.py:40-92, vendored
postgresql-42.7.7.jar).  No Postgres exists in CI, but Spark ships Derby:
the embedded driver exercises the identical DataFrameReader/Writer JDBC
code path — connection handling, type mapping, pushdown, partitioned
parallel reads — against a real SQL database.
"""

import os
import subprocess
import sys
import tempfile

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _props():
    return {"driver": DERBY}


def test_jdbc_roundtrip_and_pushdown(spark, sf_dir):
    db = tempfile.mkdtemp(prefix="sg_jdbc_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    o.write.jdbc(url, "orders_t", properties=_props())

    back = spark.read.jdbc(url, "orders_t", properties=_props())
    assert back.count() == o.count()
    assert o.subtract(back).count() == 0 and back.subtract(o).count() == 0

    # filter pushdown: the predicate must reach the JDBC scan (at scale
    # this is the DB doing the filtering, not Spark pulling the table)
    q = back.filter(F.col("o_orderstatus") == "P").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_jdbc_partitioned_parallel_read(spark, sf_dir):
    db = tempfile.mkdtemp(prefix="sg_jdbc_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    o.write.jdbc(url, "orders_t", properties=_props())
    hi = o.agg(F.max("o_orderkey")).first()[0]

    # the scale-critical JDBC read: split the table into N range-bounded
    # queries so N executors pull in parallel (a single-connection read of
    # a big table is the classic Job-2 bottleneck)
    part = spark.read.jdbc(
        url,
        "orders_t",
        column="o_orderkey",
        lowerBound=1,
        upperBound=int(hi) + 1,
        numPartitions=4,
        properties=_props(),
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == o.count()
    assert part.subtract(o).count() == 0


def test_jdbc_warehouse_load_cli(spark):
    """Job 1 (build star) then Job 2 with --jdbc-url against embedded
    Derby — the reference's exact two-job chain, warehouse included."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import _taxi_fixture

    work = tempfile.mkdtemp(prefix="sg_jdbc_cli_")
    raw_dir = f"{work}/raw"
    _taxi_fixture(spark).coalesce(1).write.mode("overwrite").parquet(raw_dir)
    part = [f for f in os.listdir(raw_dir) if f.endswith(".parquet")][0]
    src = f"{work}/yellow_tripdata_2021-01.parquet"
    os.rename(f"{raw_dir}/{part}", src)

    def run(args):
        return subprocess.run(
            [sys.executable, "-m", *args],
            cwd=work,
            env={**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "8"},
            capture_output=True,
            text=True,
            timeout=300,
        )

    r1 = run(
        [
            "glue_etl_nyc_yellow_taxi_analysis_spark.jobs.build_star",
            "--source", src,
            "--database", "sg_jdbc_db",
            "--warehouse-dir", f"{work}/wh",
        ]
    )
    assert r1.returncode == 0, r1.stderr[-2000:]

    url = f"jdbc:derby:{work}/warehouse_db;create=true"
    r2 = run(
        [
            "glue_etl_nyc_yellow_taxi_analysis_spark.jobs.load_warehouse",
            "--database", "sg_jdbc_db",
            "--year", "2021",
            "--month", "1",
            "--jdbc-url", url,
            "--jdbc-driver", DERBY,
            "--warehouse-dir", f"{work}/wh",
        ]
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "fact_uber_trips" in r2.stdout

    # the subprocess released the embedded lock on exit; read back here
    fact = spark.read.jdbc(url, "fact_uber_trips", properties=_props())
    assert fact.count() == 201
    dim = spark.read.jdbc(url, "dim_payment_type", properties=_props())
    assert dim.count() > 0
