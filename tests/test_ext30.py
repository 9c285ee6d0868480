"""ext30 — URL canonicalization, keyword tagging, token-budget packing,
BLEU-pair n-gram precision.

Replays are INDEPENDENT implementations (urllib.parse / collections.Counter
over collected rows — own tokenization, own arithmetic), never the helpers
the production lanes share (the q_mmr_rerank tautology lesson, ADVICE r5).
"""

import math
from collections import Counter
from urllib.parse import urlsplit

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext30 import (
    _TAG_MIN,
    _TOKEN_BUDGET,
    _TOPICS,
)

from test_plans import _plan


def _py_tokens(text):
    return " ".join(text.lower().split()).split(" ")


def _docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    ).collect()


# ---------------------------------------------------------------------------
# q_url_canonicalize
# ---------------------------------------------------------------------------

def _py_messy_url(doc_id, source):
    if source is None:
        return None
    host = (source.upper() if doc_id % 3 == 0 else source) + ".Example.COM"
    port = ":443" if doc_id % 5 == 0 else ""
    path = f"/Docs/{doc_id % 40}" + ("/" if doc_id % 4 == 0 else "")
    qs = (
        ("utm_source=feed&" if doc_id % 2 == 0 else "")
        + ("b=2&" if doc_id % 3 == 0 else "")
        + "a=1"
    )
    frag = "#sec" if doc_id % 7 == 0 else ""
    scheme = "http://" if doc_id % 11 == 0 else "https://"
    return f"{scheme}{host}{port}{path}?{qs}{frag}"


def _py_canonicalize(url):
    # independent parse: urllib.parse, not the production regexes
    parts = urlsplit(url)
    if parts.scheme != "https" or not parts.netloc:
        return None  # malformed/non-https → NULL, never a constant
    host = parts.netloc.lower()
    host = host[: -len(":443")] if host.endswith(":443") else host
    path = parts.path.rstrip("/")
    params = sorted(
        p for p in parts.query.split("&") if p and not p.startswith("utm_")
    )
    qs = "&".join(params)
    return f"https://{host}{path}" + (f"?{qs}" if qs else "")


def test_url_canonicalize_matches_independent_replay(spark, sf_dir):
    groups = {}
    for r in _docs(spark, sf_dir):
        url = _py_messy_url(r["doc_id"], r["source"])
        canon = None if url is None else _py_canonicalize(url)
        g = groups.setdefault(canon, {"n": 0, "urls": set(), "first": None})
        g["n"] += 1
        g["urls"].add(url)
        g["first"] = (
            r["doc_id"] if g["first"] is None else min(g["first"], r["doc_id"])
        )
    got = {
        r["canonical_url"]: (r["n_docs"], r["n_variants"], r["first_doc"])
        for r in QUERIES["q_url_canonicalize"](spark, sf_dir).collect()
    }
    expect = {
        canon: (g["n"], len(g["urls"]), g["first"]) for canon, g in groups.items()
    }
    assert got == expect


def test_url_canonicalize_collapses_variants(spark, sf_dir):
    # the lane is pointless unless canonicalization MERGES spellings:
    # at least one canonical group must hold >1 distinct messy variant
    rows = QUERIES["q_url_canonicalize"](spark, sf_dir).collect()
    assert any(r["n_variants"] > 1 for r in rows)
    assert all(
        r["canonical_url"] is None
        or (
            "#" not in r["canonical_url"]
            and "utm_" not in r["canonical_url"]
            and ":443" not in r["canonical_url"]
            and not r["canonical_url"].endswith("/")
        )
        for r in rows
    )


# ---------------------------------------------------------------------------
# q_keyword_tag
# ---------------------------------------------------------------------------

def test_keyword_tag_matches_independent_replay(spark, sf_dir):
    expect = {}
    for r in _docs(spark, sf_dir):
        cnt = Counter(_py_tokens(r["text"]))
        tags = [
            name
            for name, kws in _TOPICS
            if sum(cnt[w] for w in kws) >= _TAG_MIN
        ]
        expect[r["doc_id"]] = (",".join(tags), len(tags))
    got = {
        r["doc_id"]: (r["tags"], r["n_tags"])
        for r in QUERIES["q_keyword_tag"](spark, sf_dir).collect()
    }
    assert got == expect
    # threshold must actually discriminate: not all docs identical
    assert len({v for v in got.values()}) > 1


def test_keyword_tag_zero_shuffles_no_python(spark, sf_dir):
    plan = _plan(QUERIES["q_keyword_tag"](spark, sf_dir))
    # pure map stage: the only exchange allowed is _t's deliberate
    # round-robin spread of the single-file scan — never a keyed or
    # global shuffle
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q_token_budget_pack
# ---------------------------------------------------------------------------

def test_token_budget_pack_matches_independent_replay(spark, sf_dir):
    per_src = {}
    for r in _docs(spark, sf_dir):
        per_src.setdefault(r["source"], []).append(r)
    expect = {}
    for src, rows in per_src.items():
        rows.sort(
            key=lambda r: (
                -(r["n_chars"] if r["n_chars"] is not None else -math.inf),
                r["doc_id"],
            )
        )
        cum, n_adm, tok_adm, tok_tot = 0, 0, 0, 0
        for r in rows:
            tok = len(_py_tokens(r["text"])) if r["text"] is not None else 0
            tok_tot += tok
            cum += tok
            if cum <= _TOKEN_BUDGET:
                n_adm += 1
                tok_adm += tok
        share = tok_adm * 10000 // tok_tot if tok_tot > 0 else None
        expect[src] = (len(rows), tok_tot, n_adm, tok_adm, share)
    got = {
        r["source"]: (
            r["n_docs"],
            r["tok_total"],
            r["n_admitted"],
            r["tok_admitted"],
            r["share_e4"],
        )
        for r in QUERIES["q_token_budget_pack"](spark, sf_dir).collect()
    }
    assert got == expect
    # the budget must bind: nobody admits everything at sf >= 0.001
    assert any(v[2] < v[0] for v in got.values())


def test_token_budget_pack_no_global_sort(spark, sf_dir):
    plan = _plan(QUERIES["q_token_budget_pack"](spark, sf_dir))
    # the window sorts WITHIN source partitions; a rangepartitioning
    # exchange would mean a global sort crept in
    assert "rangepartitioning" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# q_bleu_pairs
# ---------------------------------------------------------------------------

def test_bleu_pairs_matches_independent_replay(spark, sf_dir):
    per_src = {}
    toks = {}
    for r in _docs(spark, sf_dir):
        per_src.setdefault(r["source"], []).append(r["doc_id"])
        if r["text"] is not None:
            toks[r["doc_id"]] = _py_tokens(r["text"])
    expect = {}
    for src, ids in per_src.items():
        ids.sort()
        for cand, ref in zip(ids, ids[1:]):
            ct = toks.get(cand)
            if ct is None:
                continue  # NULL text: no token rows on either engine
            rt = toks.get(ref, [])
            cu, ru = Counter(ct), Counter(rt)
            num1 = sum(min(c, ru[g]) for g, c in cu.items())
            den1 = sum(cu.values())
            p1 = num1 * 1000000 // den1
            cb = Counter(zip(ct, ct[1:]))
            rb = Counter(zip(rt, rt[1:]))
            if cb:
                num2 = sum(min(c, rb[g]) for g, c in cb.items())
                den2 = sum(cb.values())
                p2 = num2 * 1000000 // den2
                bleu = math.floor(math.sqrt(float(p1 * p2)))
            else:
                p2 = bleu = None
            expect[(cand, ref)] = (den1, p1, p2, bleu)
    got = {
        (r["cand"], r["ref_id"]): (
            r["n_cand_tokens"],
            r["p1_e6"],
            r["p2_e6"],
            r["bleu2_e6"],
        )
        for r in QUERIES["q_bleu_pairs"](spark, sf_dir).collect()
    }
    assert got == expect


def test_bleu_pairs_never_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["q_bleu_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
