"""ext36 — positional phrase search.  Replay is an INDEPENDENT
pure-Python scan (str.split + sliding window), never the posting join.
"""

from collections import defaultdict

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES, _t
from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext36 import _PHRASES


def _py_tokens(t):
    return " ".join(t.lower().split()).split(" ")


def test_phrase_search_matches_independent_replay(spark, sf_dir):
    expect = {}
    docs = [
        (r["doc_id"], r["text"])
        for r in _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    for phrase in _PHRASES:
        terms = phrase.split(" ")
        for doc_id, txt in docs:
            if txt is None:
                continue
            toks = _py_tokens(txt)
            hits = [
                i
                for i in range(len(toks) - len(terms) + 1)
                if toks[i : i + len(terms)] == terms
            ]
            if hits:
                expect[(phrase, doc_id)] = (len(hits), hits[0])
    got = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in QUERIES["q_phrase_search"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "no phrase matched at this sf — the lane is vacuous"


def test_phrase_search_counts_overlapping_and_duplicate_words(spark):
    """'spark window window' must match inside 'spark window window
    window' twice-adjacent?  No — starts 0 only ('window window window'
    lacks the leading spark at start 1); and overlapping occurrences of
    'a a' in 'a a a' are BOTH counted (starts 0 and 1) — the
    count(DISTINCT term_idx) grouping gets duplicate-word phrases right."""
    from glue_etl_nyc_yellow_taxi_analysis_spark import queries_ext36 as m

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "spark window window window"), (3, None)],
        "doc_id long, text string",
    )
    real = m._PHRASES
    try:
        m._PHRASES = ("a a", "spark window window")
        orig_t = m._t
        m._t = lambda s, d, n: df
        rows = {
            (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
            for r in m.q_phrase_search(spark, "ignored").collect()
        }
    finally:
        m._PHRASES, m._t = real, orig_t
    assert rows == {
        ("a a", 1): (2, 0),
        ("spark window window", 2): (1, 0),
    }
