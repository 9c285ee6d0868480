"""ext32 — ROUGE pairs, Kendall rank correlation, blocklist filter.

Replays are INDEPENDENT implementations (collections.Counter pair
counting over collected rows — own tokenization, own arithmetic),
never the production helpers (the q_mmr_rerank tautology lesson,
ADVICE r5).
"""

from collections import Counter, defaultdict

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext32 import (
    _BLOCKLIST,
    _TAU_K,
)

from test_plans import _plan


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


def _tdiv(a, b):
    """Integer division truncating toward zero — Spark `div` and DuckDB
    `//` both truncate (-7 div 2 = -3), Python `//` floors (-4)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    ).collect()


# ---------------------------------------------------------------------------
# q_rouge_pairs
# ---------------------------------------------------------------------------

def test_rouge_pairs_matches_independent_replay(spark, sf_dir):
    by_source = defaultdict(list)
    toks = {}
    for r in _docs(spark, sf_dir):
        by_source[r["source"]].append(r["doc_id"])
        if r["text"] is not None:
            toks[r["doc_id"]] = _py_tokens(r["text"])
    expect = {}
    for ids in by_source.values():
        ids.sort()
        for cand, ref in zip(ids, ids[1:]):
            ct, rt = toks.get(cand), toks.get(ref)
            if ct is None or rt is None:
                continue  # NULL text: no gram/len rows on either engine
            cu, ru = Counter(ct), Counter(rt)
            m1 = sum(min(c, ru[g]) for g, c in cu.items())
            clen, rlen = sum(cu.values()), sum(ru.values())
            r1 = m1 * 1000000 // rlen
            f1 = 2 * m1 * 1000000 // (clen + rlen)
            cb = Counter(zip(ct, ct[1:]))
            rb = Counter(zip(rt, rt[1:]))
            if cb and rb:
                m2 = sum(min(c, rb[g]) for g, c in cb.items())
                r2 = m2 * 1000000 // sum(rb.values())
                f2 = 2 * m2 * 1000000 // (sum(cb.values()) + sum(rb.values()))
            else:
                m2 = r2 = f2 = None
            expect[(cand, ref)] = (m1, r1, f1, m2, r2, f2)
    got = {
        (r["cand"], r["ref_id"]): (
            r["m1"], r["r1_e6"], r["f1_e6"], r["m2"], r["r2_e6"], r["f2_e6"]
        )
        for r in QUERIES["q_rouge_pairs"](spark, sf_dir).collect()
    }
    assert got == expect


def test_rouge_pairs_never_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["q_rouge_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q_rank_correlation
# ---------------------------------------------------------------------------

def test_rank_correlation_matches_independent_replay(spark, sf_dir):
    by_source = defaultdict(list)
    for r in _docs(spark, sf_dir):
        n_types = (
            None if r["text"] is None else len(set(_py_tokens(r["text"])))
        )
        by_source[r["source"]].append((r["doc_id"], r["n_chars"], n_types))
    expect = {}
    for src, rows in by_source.items():
        rows.sort()
        sel = rows[:_TAU_K]

        def nf(v):  # NULLS FIRST sort key
            return (0, 0) if v is None else (1, v)

        ra = {
            d: i + 1
            for i, (d, nc, _) in enumerate(
                sorted(sel, key=lambda t: (nf(t[1]), t[0]))
            )
        }
        rb = {
            d: i + 1
            for i, (d, _, nt) in enumerate(
                sorted(sel, key=lambda t: (nf(t[2]), t[0]))
            )
        }
        ids = sorted(d for d, _, _ in sel)
        conc = pairs = 0
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs += 1
                a, b = ids[i], ids[j]
                if (ra[a] - ra[b]) * (rb[a] - rb[b]) > 0:
                    conc += 1
        if pairs:
            expect[src] = (
                pairs,
                conc,
                pairs - conc,
                _tdiv((2 * conc - pairs) * 1000000, pairs),
            )
    got = {
        r["source"]: (
            r["n_pairs"], r["concordant"], r["discordant"], r["tau_e6"]
        )
        for r in QUERIES["q_rank_correlation"](spark, sf_dir).collect()
    }
    assert got == expect


def test_rank_correlation_pair_join_is_k_bounded(spark, sf_dir):
    """The row_number ≤ K prune must apply BEFORE the self-join: the
    joined rows per source are ≤ K(K−1)/2 regardless of corpus size."""
    out = QUERIES["q_rank_correlation"](spark, sf_dir).collect()
    assert out and all(
        r["n_pairs"] <= _TAU_K * (_TAU_K - 1) // 2 for r in out
    )
    assert all(
        r["concordant"] + r["discordant"] == r["n_pairs"] for r in out
    )


# ---------------------------------------------------------------------------
# q_blocklist_filter
# ---------------------------------------------------------------------------

def test_blocklist_filter_matches_independent_replay(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, flagged, hits, toks
    for r in _docs(spark, sf_dir):
        toks = [] if r["text"] is None else _py_tokens(r["text"])
        hits = sum(1 for t in toks if t in _BLOCKLIST)
        a = agg[r["source"]]
        a[0] += 1
        a[1] += 1 if hits > 0 else 0
        a[2] += hits
        a[3] += len(toks)
    expect = {
        src: (d, f, h, t, d - f, f * 10000 // d)
        for src, (d, f, h, t) in agg.items()
    }
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_flagged"],
            r["hit_tokens"],
            r["total_tokens"],
            r["kept_docs"],
            r["flagged_share_e4"],
        )
        for r in QUERIES["q_blocklist_filter"](spark, sf_dir).collect()
    }
    assert got == expect


def test_blocklist_filter_stays_jvm_side(spark, sf_dir):
    """The lambda filter is a JVM higher-order function: no Python eval,
    no join — the blocklist is a literal inside the plan."""
    plan = _plan(QUERIES["q_blocklist_filter"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_blocklist_absent_word_costs_nothing(spark, sf_dir):
    """'warp' never occurs: total hits must equal the corpus count of
    'dup' + 'spark' occurrences exactly."""
    rows = QUERIES["q_blocklist_filter"](spark, sf_dir).collect()
    total_hits = sum(r["hit_tokens"] for r in rows)
    occ = 0
    for r in _docs(spark, sf_dir):
        if r["text"] is not None:
            occ += sum(
                1 for t in _py_tokens(r["text"]) if t in ("dup", "spark")
            )
    assert total_hits == occ
