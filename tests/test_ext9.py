"""Behavior contracts for extension batch IX (queries_ext9)."""

import contextlib
import hashlib
import io

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --------------------------------------------------------------- fk orphans

def test_fk_orphans_finds_planted_and_only_planted(spark, sf_dir):
    rows = {r.relationship: r for r in QUERIES["q_fk_orphans"](spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem->orders", "lineitem->part",
        "lineitem->supplier", "orders->customer",
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    planted = li.filter("l_orderkey % 211 = 0").count()
    assert rows["lineitem->orders"].n_orphans == planted > 0
    for clean in ("lineitem->part", "lineitem->supplier", "orders->customer"):
        assert rows[clean].n_orphans == 0
        assert rows[clean].orphan_key_sum == 0
    assert rows["lineitem->orders"].n_child == li.count()


def test_fk_orphans_broadcasts_small_parents(spark, sf_dir):
    plan = _plan(QUERIES["q_fk_orphans"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------- bm25

def test_bm25_ranked_and_bounded(spark, sf_dir):
    rows = QUERIES["q_bm25_search"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.n_terms_hit <= 3


def test_bm25_hits_contain_query_terms(spark, sf_dir):
    rows = QUERIES["q_bm25_search"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        text = docs[r.doc_id].lower()
        assert any(t in text for t in ("spark", "join", "fast"))


# ------------------------------------------------------------ event pattern

def test_event_pattern_counts_match_python(spark, sf_dir):
    import re

    rows = QUERIES["q_event_pattern"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # recompute one user's sequence in plain Python
    uid = rows[0].user_id
    seq = "".join(
        r.event_type[0]
        for r in ev.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    )
    got = next(r for r in rows if r.user_id == uid)
    assert got.n_events == len(seq)
    assert got.n_convert == len(re.findall(r"v[ces]*p", seq))
    assert got.seq_prefix == seq[:20]


# -------------------------------------------------------------- attribution

def test_attribution_conserves_users_and_revenue(spark, sf_dir):
    rows = QUERIES["q_attribution"](spark, sf_dir).collect()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r.users_first for r in rows) == n_users
    assert sum(r.users_last for r in rows) == n_users
    # both models attribute the SAME total revenue, just differently split
    assert abs(sum(r.rev_first for r in rows) - sum(r.rev_last for r in rows)) < 0.05


# ------------------------------------------------------------------ benford

def test_benford_shares_form_distribution(spark, sf_dir):
    rows = QUERIES["q_benford"](spark, sf_dir).collect()
    assert all(1 <= r.digit <= 9 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # Benford expectations themselves must sum to 1 over digits present
    for r in rows:
        assert 0 < r.benford_expected < 0.302


# --------------------------------------------------------------------- ewma

def test_ewma_equals_value_on_first_event(spark, sf_dir):
    df = QUERIES["q_ewma_smooth"](spark, sf_dir)
    rows = df.collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter("user_id % 10 = 0")
    first_ids = {
        r.event_id
        for r in ev.groupBy("user_id")
        .agg(F.expr("min_by(event_id, struct(ts, event_id))").alias("event_id"))
        .collect()
    }
    for r in rows:
        if r.event_id in first_ids:
            assert abs(r.ewma - r.val) < 1e-6


# ------------------------------------------------------------- lateral topN

def test_lateral_topn_caps_per_group(spark, sf_dir):
    rows = QUERIES["q_sql_lateral_topn"](spark, sf_dir).collect()
    from collections import Counter

    per_nation = Counter(r.n_name for r in rows)
    assert all(c <= 3 for c in per_nation.values())
    # each nation's rows are its true top-3 by balance
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nk = {r.n_name: r.n_nationkey for r in nation.collect()}
    for name in list(per_nation)[:3]:
        top = [
            r.c_name
            for r in cust.filter(F.col("c_nationkey") == nk[name])
            .orderBy(F.desc("c_acctbal"), "c_name")
            .limit(3)
            .collect()
        ]
        got = sorted(r.c_name for r in rows if r.n_name == name)
        assert got == sorted(top)


# ------------------------------------------------------------- variant json

def test_variant_json_partitions_all_events(spark, sf_dir):
    rows = QUERIES["q_variant_json"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == total
    assert all(r.k is not None for r in rows)


# --------------------------------------------------------------- binaryFile

def test_binaryfile_md5_matches_python(spark, sf_dir):
    rows = QUERIES["q_binaryfile_source"](spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id % 50 = 0")
        .collect()
    }
    assert set(docs) == {r.doc_id for r in rows}
    for r in rows:
        raw = docs[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.content_md5 == hashlib.md5(raw).hexdigest()


# ------------------------------------------------------------- skew profile

def test_skew_profile_bounds(spark, sf_dir):
    rows = QUERIES["q_key_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_keys > 0 and r.n_rows >= r.n_keys
        assert r.max_cnt >= 1
        assert r.top1_share >= 1.0 / r.n_keys - 1e-9
        assert 0.0 <= r.gini < 1.0


# ----------------------------------------------------------- triangle count

def test_triangle_count_matches_python(spark, sf_dir):
    row = QUERIES["q_triangle_count"](spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter("l_orderkey % 20 = 0")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from itertools import combinations

    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj = defaultdict(set)
    nodes = set()
    for u, v in edges:
        adj[u].add(v)
        nodes.update((u, v))
    tri = sum(
        1 for (u, v) in edges for w in adj[v] if w in adj[u]
    )
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri


# ------------------------------------------------------------------ graph bfs

def test_graph_bfs_hops_monotone_and_rooted(spark, sf_dir):
    rows = {r.hop: r.n_nodes for r in QUERIES["q_graph_bfs"](spark, sf_dir).collect()}
    assert 0 in rows  # seed layer present
    assert set(rows) <= {0, 1, 2, 3}
    # hop-h layer only exists if hop-(h-1) did
    for h in (1, 2, 3):
        if h in rows:
            assert (h - 1) in rows
