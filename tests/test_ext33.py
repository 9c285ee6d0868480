"""ext33 — NDCG@k and MRR ranking-quality metrics.

Replays are INDEPENDENT implementations (own tokenization, own Counter
arithmetic, own sort-based ranking over collected rows), never the
production helpers.
"""

from collections import Counter, defaultdict

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext33 import (
    _DISC_E9,
    _EVAL_QUERIES,
    _NDCG_K,
)

from test_plans import _plan


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


def _py_candidates(spark, sf_dir):
    """query_id -> list of (doc_id, tf_sum, rel) via raw recount."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    out = defaultdict(list)
    for r in docs:
        if r["text"] is None:
            continue
        c = Counter(_py_tokens(r["text"]))
        for qid, terms in _EVAL_QUERIES:
            tf = sum(c[t] for t in terms)
            rel = sum(1 for t in terms if c[t] > 0)
            if rel > 0:
                out[qid].append((r["doc_id"], tf, rel))
    return out


def test_ndcg_matches_independent_replay(spark, sf_dir):
    cand = _py_candidates(spark, sf_dir)
    expect = {}
    for qid, rows in cand.items():
        by_score = sorted(rows, key=lambda t: (-t[1], t[0]))[:_NDCG_K]
        gains = [(1 << rel) - 1 for _, _, rel in by_score]
        dcg = sum(g * d for g, d in zip(gains, _DISC_E9))
        ideal = sorted(
            ((1 << rel) - 1, doc) for doc, _, rel in rows
        )
        ideal = sorted(ideal, key=lambda t: (-t[0], t[1]))[:_NDCG_K]
        idcg = sum(g * d for (g, _), d in zip(ideal, _DISC_E9))
        expect[qid] = (len(rows), dcg, idcg, dcg * 1000000 // idcg)
    got = {
        r["query_id"]: (r["n_cand"], r["dcg_e9"], r["idcg_e9"], r["ndcg_e6"])
        for r in QUERIES["q_ndcg_at_k"](spark, sf_dir).collect()
    }
    assert got == expect


def test_mrr_matches_independent_replay(spark, sf_dir):
    cand = _py_candidates(spark, sf_dir)
    expect = {}
    for qid, terms in _EVAL_QUERIES:
        rows = cand.get(qid, [])
        ranking = sorted(rows, key=lambda t: (-t[1], t[0]))
        first = next(
            (
                i + 1
                for i, (_, _, rel) in enumerate(ranking)
                if rel == len(terms)
            ),
            None,
        )
        n_rel = sum(1 for _, _, rel in rows if rel == len(terms))
        expect[qid] = (
            n_rel,
            first,
            1000000 // first if first else 0,
        )
    got = {
        r["query_id"]: (r["n_relevant"], r["first_rank"], r["rr_e6"])
        for r in QUERIES["q_mrr"](spark, sf_dir).collect()
    }
    assert got == expect


def test_ndcg_topk_uses_window_group_limit(spark, sf_dir):
    """The row_number ≤ k cut must execute as WindowGroupLimit (partial
    per-task top-k BEFORE the shuffle) — remove the filter-on-rn
    pattern and this breaks, leaving a full-partition sort per query."""
    df = QUERIES["q_ndcg_at_k"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # score + ideal windows
    plan2 = _plan(df)
    assert "CartesianProduct" not in plan2
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_mrr_has_no_window_at_all(spark, sf_dir):
    """MRR's count formula needs no ordered pass: no Window/Sort over
    the candidate table (broadcast best-row join + keyed aggregate)."""
    plan = _plan(QUERIES["q_mrr"](spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mrr_zero_relevant_query_scores_zero(spark, sf_dir):
    """q5 carries a term the corpus never has: no fully-relevant doc
    exists, and the lane must emit rr_e6 = 0, not drop the row."""
    rows = {
        r["query_id"]: r for r in QUERIES["q_mrr"](spark, sf_dir).collect()
    }
    assert rows["q5"]["n_relevant"] == 0
    assert rows["q5"]["first_rank"] is None
    assert rows["q5"]["rr_e6"] == 0
    assert len(rows) == len(_EVAL_QUERIES)
