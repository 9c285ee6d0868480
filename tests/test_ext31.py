"""ext31 — HLL distinct sketch, exact ROC-AUC, l-diversity.

Replays are INDEPENDENT implementations (own md5 arithmetic, own pair
counting over collected rows), never the production helpers.
"""

import hashlib
from collections import Counter

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext31 import (
    _HLL_M,
    _HLL_RMAX,
    _HLL_WBITS,
    _LDIV_BAND,
    _LDIV_L,
)

from test_plans import _plan


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


def _py_shingles(toks, n=3):
    out = []
    for i in range(max(len(toks) - n, 0) + 1):
        out.append(" ".join(toks[i : i + n]))
    return set(out)


# ---------------------------------------------------------------------------
# q_hll_distinct
# ---------------------------------------------------------------------------

def _py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hll_matches_independent_python_replay(spark, sf_dir):
    shingles = set()
    for r in _t(spark, sf_dir, "documents").select("text").collect():
        if r["text"] is not None:
            shingles |= _py_shingles(_py_tokens(r["text"]))
    regs = {}
    for s in shingles:
        h = _py_hash32("hll|" + s)
        idx, w = h >> _HLL_WBITS, h % (1 << _HLL_WBITS)
        rho = _HLL_RMAX if w == 0 else _HLL_RMAX - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s27 = sum(1 << (_HLL_RMAX - r) for r in regs.values()) + (
        _HLL_M - len(regs)
    ) * (1 << _HLL_RMAX)
    num = 230816 * _HLL_M * _HLL_M * (1 << _HLL_RMAX)
    row = QUERIES["q_hll_distinct"](spark, sf_dir).collect()[0]
    assert row["n_present"] == len(regs)
    assert row["s27"] == s27
    assert row["est_e0"] == num // (325395 * s27)
    assert row["n_exact"] == len(shingles)


def test_hll_merge_is_lossless_and_error_bounded(spark, sf_dir):
    row = QUERIES["q_hll_distinct"](spark, sf_dir).collect()[0]
    # register-wise MAX merge must reproduce the whole-corpus sketch
    assert row["merge_equal"] == row["merge_regs"]
    # standard error 1.04/sqrt(64) = 13%; pin inside 2 sigma
    err = abs(row["est_e0"] - row["n_exact"]) / max(row["n_exact"], 1)
    assert err < 0.26, f"HLL error {err:.3f} outside 2-sigma band"


def test_hll_no_cartesian_no_python(spark, sf_dir):
    plan = _plan(QUERIES["q_hll_distinct"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q_quality_auc
# ---------------------------------------------------------------------------

def test_quality_auc_matches_exact_pair_count(spark, sf_dir):
    rows = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    doc_bg, labels = {}, {}
    for r in rows:
        if r["text"] is None:
            continue
        toks = _py_tokens(r["text"])
        labels[r["doc_id"]] = 1 if "dup" in toks else 0
        bgs = {
            (a, b)
            for a, b in zip(toks, toks[1:])
            if a != "dup" and b != "dup"
        }
        if bgs:
            doc_bg[r["doc_id"]] = bgs
    dfreq = Counter(g for bgs in doc_bg.values() for g in bgs)
    scores = {
        d: sum(dfreq[g] for g in bgs) * 10000 // len(bgs)
        for d, bgs in doc_bg.items()
    }
    pos = [scores[d] for d in scores if labels[d] == 1]
    neg = [scores[d] for d in scores if labels[d] == 0]
    # O(P*N) exact pair count — fine at test scale
    num2 = sum(
        2 if p > n_ else (1 if p == n_ else 0) for p in pos for n_ in neg
    )
    expect = num2 * 1000000 // (2 * len(pos) * len(neg))
    row = QUERIES["q_quality_auc"](spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert row["auc_e6"] == expect
    # the score must actually separate the classes
    assert row["auc_e6"] > 550000


def test_quality_auc_single_row_no_python(spark, sf_dir):
    plan = _plan(QUERIES["q_quality_auc"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q_l_diversity
# ---------------------------------------------------------------------------

def test_l_diversity_matches_independent_replay(spark, sf_dir):
    groups = {}
    for r in _t(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars"
    ).collect():
        g = groups.setdefault((r["lang"], r["source"]), {"k": 0, "bands": set()})
        g["k"] += 1
        if r["n_chars"] is not None:
            g["bands"].add(r["n_chars"] // _LDIV_BAND)
    got = {
        (r["lang"], r["source"]): (r["k_size"], r["l_distinct"], r["is_diverse"])
        for r in QUERIES["q_l_diversity"](spark, sf_dir).collect()
    }
    expect = {
        k: (g["k"], len(g["bands"]), int(len(g["bands"]) >= _LDIV_L))
        for k, g in groups.items()
    }
    assert got == expect
