"""Storage-layout operators: clustering quality, compaction, runtime filters.

Clustering quality is measured the way a scan planner would: parquet
footer min/max per file (no data pages read).  Z-order must bound BOTH
clustered columns per file; a linear sort only bounds its leading key.
"""

import os

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators.layout import (
    compact,
    file_stats,
    zorder_layout,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.operators.partitioning import (
    range_partition_sorted,
)


def _mean_span(stats, col, span):
    widths = [(s[f"{col}_max"] - s[f"{col}_min"]) / span for s in stats]
    return sum(widths) / len(widths)


def test_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_p, hi_p = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    lo_c, hi_c = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    xspan, yspan = float(hi_p - lo_p), float(hi_c - lo_c)

    linear_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    range_partition_sorted(o, ["o_totalprice"], 8).write.parquet(linear_path)
    zorder_layout(o, ["o_totalprice", "o_custkey"], 8).drop("__zkey").write.parquet(
        z_path
    )

    lin = file_stats(linear_path, ["o_totalprice", "o_custkey"])
    zed = file_stats(z_path, ["o_totalprice", "o_custkey"])
    assert len(lin) == len(zed) == 8
    # the z-order claim is per-column: a linear sort on price bounds price
    # tightly but leaves every file spanning ~the full custkey range (a
    # custkey predicate prunes NOTHING); z-order bounds BOTH columns, so
    # predicates on either prune files
    assert _mean_span(lin, "o_custkey", yspan) > 0.9
    assert _mean_span(zed, "o_custkey", yspan) < 0.6
    assert _mean_span(zed, "o_totalprice", xspan) < 0.75

    # and the row bag is unchanged by relayout
    back = spark.read.parquet(z_path)
    assert back.count() == o.count()
    assert o.subtract(back).count() == 0 and back.subtract(o).count() == 0


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    frag_path = str(tmp_path / "fragmented")
    out_path = str(tmp_path / "compacted")
    o.repartition(64).write.parquet(frag_path)
    n_in = sum(
        1
        for _r, _d, fs in os.walk(frag_path)
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_in == 64
    n_out = compact(spark, frag_path, out_path, target_file_bytes=512 * 1024)
    assert n_out < n_in
    back = spark.read.parquet(out_path)
    assert back.count() == o.count()
    assert o.subtract(back).count() == 0 and back.subtract(o).count() == 0


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    # a selective dim-side filter must inject a bloom filter on the fact's
    # scan (semi-join pushdown at runtime) when broadcast is off — the
    # fact rows that can't match never reach the shuffle
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderstatus = 'P'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
