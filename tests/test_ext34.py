"""ext34 — full-outer join lane, sqrt-temperature mixture, GROUP BY ALL.

Replays are INDEPENDENT implementations (dict-merge joins, math.isqrt
arithmetic over collected rows), never the production helpers.
"""

import math
from collections import defaultdict

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext34 import _FOJ_BAL

from test_plans import _plan


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


# ---------------------------------------------------------------------------
# q_join_full_outer
# ---------------------------------------------------------------------------

def test_join_full_outer_matches_independent_replay(spark, sf_dir):
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in _t(spark, sf_dir, "customer").collect()
        if r["c_acctbal"] > _FOJ_BAL
    }
    ords = defaultdict(int)
    for r in _t(spark, sf_dir, "orders").collect():
        if r["o_orderstatus"] == "F":
            ords[r["o_custkey"]] += 1
    expect = {}
    for k in set(cust) | set(ords):
        mt = (
            "both"
            if k in cust and k in ords
            else ("left_only" if k in cust else "right_only")
        )
        expect[k] = (
            cust.get(k),
            ords[k] if k in ords else None,
            mt,
        )
    got = {
        r["custkey"]: (r["segment"], r["n_orders"], r["match_type"])
        for r in QUERIES["q_join_full_outer"](spark, sf_dir).collect()
    }
    assert got == expect


def test_join_full_outer_covers_all_three_regions(spark, sf_dir):
    """The balance/status cuts must leave genuinely unmatched rows on
    BOTH sides — otherwise the lane degenerates to an inner join."""
    kinds = {
        r["match_type"]
        for r in QUERIES["q_join_full_outer"](spark, sf_dir).collect()
    }
    assert kinds == {"both", "left_only", "right_only"}
    plan = _plan(QUERIES["q_join_full_outer"](spark, sf_dir))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# q_mixture_temperature
# ---------------------------------------------------------------------------

def test_mixture_temperature_matches_independent_replay(spark, sf_dir):
    toks = defaultdict(int)
    for r in _t(spark, sf_dir, "documents").select("source", "text").collect():
        toks[r["source"]] += (
            0 if r["text"] is None else len(_py_tokens(r["text"]))
        )
    # independent sqrt: math.isqrt on the EXACT integer would differ
    # from IEEE sqrt(double) only when n*1e12 exceeds 2^53 AND the
    # rounded double crosses an integer boundary — replicate the
    # engines' contract (double rounding then correctly-rounded sqrt)
    s = {
        src: math.floor(math.sqrt(float(n * 10**12)))
        for src, n in toks.items()
    }
    t = sum(s.values())
    expect = {
        src: (toks[src], s[src], s[src] * 1000000 // t) for src in toks
    }
    got = {
        r["source"]: (r["n_tokens"], r["s_scaled"], r["share_e6"])
        for r in QUERIES["q_mixture_temperature"](spark, sf_dir).collect()
    }
    assert got == expect


def test_mixture_temperature_shares_sum_to_one(spark, sf_dir):
    """Integer-division shares under-shoot by < |sources| ppm total."""
    rows = QUERIES["q_mixture_temperature"](spark, sf_dir).collect()
    total = sum(r["share_e6"] for r in rows)
    assert 1000000 - len(rows) < total <= 1000000
    # sqrt scaling compresses the spread: the largest source's share
    # must shrink vs its raw-token share (unless all sources are equal)
    big = max(rows, key=lambda r: r["n_tokens"])
    tok_total = sum(r["n_tokens"] for r in rows)
    assert big["share_e6"] * tok_total <= big["n_tokens"] * 1000000


# ---------------------------------------------------------------------------
# q_sql_group_by_all
# ---------------------------------------------------------------------------

def test_sql_group_by_all_matches_explicit_grouping(spark, sf_dir):
    """GROUP BY ALL must resolve to exactly the non-aggregate select
    list: the explicit GROUP BY twin returns identical rows."""
    got = {
        (r["ship_year"], r["l_returnflag"], r["l_linestatus"]): (
            r["n_items"],
            r["revenue"],
        )
        for r in QUERIES["q_sql_group_by_all"](spark, sf_dir).collect()
    }
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    twin = spark.sql(
        """
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
               l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem GROUP BY 1, 2, 3
        """
    )
    expect = {
        (r["ship_year"], r["l_returnflag"], r["l_linestatus"]): (
            r["n_items"],
            r["revenue"],
        )
        for r in twin.collect()
    }
    assert got == expect
