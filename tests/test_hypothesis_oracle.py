"""Property-based cross-engine agreement: hypothesis-generated corpora
through Spark AND DuckDB for the eval/curation lanes.

The hostile-corpus gate (test_adversarial_inputs.py) checks ONE
hand-built fixture; this gate SEARCHES the corpus space — random doc
counts, NULL text/source/n_chars, empty and single-token docs, repeated
words, blocklist and query-term collisions — and asserts the bit-exact
row agreement the driver's hash gate enforces.  A divergence here is a
real oracle bug the fixtures never exercised (the r3/r4 advisory class).

Kept cheap: one corpus per example, every lane checked against the SAME
corpus (amortizes the Spark jobs), few examples — the value is in the
generator's corners, not the sample count.
"""

import pytest

pytestmark = pytest.mark.slow  # multi-session e2e; excluded from the driver-window run

import os
import shutil
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings, strategies as st

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE, QUERIES

_SPARK = None


def setup_module(module):
    global _SPARK
    from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark

    _SPARK = get_spark(app_name="engine-tests", cpus=8, shuffle_partitions=8)


# the word pool deliberately collides with the blocklist ('dup',
# 'spark', absent 'warp' stays absent) and the NDCG/MRR query terms
# ('spark join fast', 'window sort scan', ...) so relevance grades,
# blocklist hits and gram overlaps all vary per example
_WORDS = (
    "spark", "join", "fast", "window", "sort", "scan", "dup", "merge",
    "stream", "batch", "key", "agg", "the", "a",
)

_text = st.one_of(
    st.none(),
    st.just(""),
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10).map(" ".join),
)
_doc = st.tuples(
    _text,
    st.one_of(st.none(), st.sampled_from(("s1", "s2", "s3"))),
    st.one_of(st.none(), st.sampled_from(("en", "de"))),
    st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
)
_corpus = st.lists(_doc, min_size=1, max_size=25)

# lanes over the documents table alone, integral outputs, no
# positional-byte oracles (the codec-lane ASCII caveat doesn't apply
# here — the generator is ASCII anyway — but decode lanes need binary
# plants these corpora don't carry)
_LANES = (
    "q_rouge_pairs",
    "q_bleu_pairs",
    "q_rank_correlation",
    "q_blocklist_filter",
    "q_ndcg_at_k",
    "q_mrr",
    "q_l_diversity",
    "q_mixture_temperature",
    # window + NULLS-ordering risk: per-source longest-first admission
    # orders by n_chars, which the generator NULLs freely
    "q_token_budget_pack",
    # text-stat + hash + LM lanes: empty-token contract ([""] for
    # empty text), cross-engine md5 hashing, exact-integer log2 LM
    "q_text_stats",
    "q_lang_id",
    "q_doc_fingerprint",
    "q_hll_distinct",
    "q_kn_bigram_ppl",
    "q_quality_auc",
    # the shingle-contract class (ordered_shingles NULL-text finding):
    # winnowing and the boilerplate DF join must drop NULL-text docs
    # identically on both engines
    "q_winnow_fingerprints",
    "q_boilerplate_ratio",
)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v) if v == v else "nan"
    return str(v)


# ---------------------------------------------------------------------------
# events lanes — the ordering-sensitive class (NULLS FIRST, tied
# timestamps, exact-gap boundaries; the r4/r5 advisory territory)
# ---------------------------------------------------------------------------

import datetime as _dt

_T0 = _dt.datetime(2024, 1, 1, 10, 0, 0)

# offsets cluster around the 1800s session gap and repeat exactly so
# tied (user_id, ts) pairs and exact-boundary gaps occur often; None
# exercises the NULLS FIRST ordering contract
_ts = st.one_of(
    st.none(),
    st.sampled_from([0, 100, 100, 600, 1800, 1801, 3600, 3601]).map(
        lambda s: _T0 + _dt.timedelta(seconds=s)
    ),
)
# integers-as-floats, halves and 0.1 still exercise the decimal-routed
# float lanes without hunting libm corners this gate isn't about
_val = st.one_of(
    st.none(),
    st.sampled_from([0.0, 1.0, 2.5, -3.25, 0.1, 10.0]),
)
_event = st.tuples(
    _ts,
    st.one_of(st.none(), st.integers(min_value=1, max_value=4)),
    st.one_of(st.none(), st.sampled_from(("view", "click", "purchase"))),
    _val,
    st.one_of(st.none(), st.sampled_from(('{"k": 1}', "{}", '{"k": 2}'))),
)
_events_corpus = st.lists(_event, min_size=1, max_size=20)

_EVENT_LANES = (
    "q_session_windows",
    "q_event_sessionize",
    "q_lag_lead_delta",
    "q_running_total",
    "q_islands_gaps",
    "q_markov_transitions",
    "q_time_weighted_avg",
    "q_ewma_smooth",
    "q_scd2_history",
    "q_scd2_pit",
    "q_trailing_window_range",
    # second tranche: the r6-rewritten dedup-keyed oracle, funnel/
    # attribution orderings, the as-of join's backward probe, and the
    # interval self-overlap — all tiebreak/NULL-sensitive
    "q_dedup_keyed",
    "q_funnel",
    "q_attribution",
    "q_event_pattern",
    "q_asof_join",
    "q_interval_overlap",
    # third tranche: window frames, JSON extraction over NULL props,
    # truncation/bitops, the two-phase global index, skew profiling
    "q_sliding_windows",
    "q_date_trunc",
    "q_json_extract",
    "q_variant_json",
    "q_global_index",
    "q_bitwise_ops",
    "q_salt_plan",
    "q_bitmap_distinct",
    "q_range_join_bands",
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_events_corpus)
def test_random_events_cross_engine_agreement(corpus):
    d = tempfile.mkdtemp(prefix="sg_hyp_ev_")
    try:
        ev = pa.table(
            {
                "event_id": pa.array(range(len(corpus)), pa.int64()),
                "ts": pa.array(
                    [r[0] for r in corpus], pa.timestamp("us")
                ),
                "user_id": pa.array([r[1] for r in corpus], pa.int64()),
                "event_type": pa.array([r[2] for r in corpus], pa.string()),
                "value": pa.array([r[3] for r in corpus], pa.float64()),
                "props": pa.array([r[4] for r in corpus], pa.string()),
            }
        )
        pq.write_table(ev, os.path.join(d, "events.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
        )
        for name in _EVENT_LANES:
            df = QUERIES[name](_SPARK, d)
            cols = df.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_lines = sorted(
                "|".join(_norm(r[i]) for i in order) for r in df.collect()
            )
            res = con.execute(ORACLE[name])
            o_cols = [c[0] for c in res.description]
            oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            d_lines = sorted(
                "|".join(_norm(r[i]) for i in oo) for r in res.fetchall()
            )
            assert sorted(cols) == sorted(o_cols), name
            assert s_lines == d_lines, (
                f"{name} diverged on a {len(corpus)}-event random corpus:\n"
                f"spark={s_lines[:5]}\nduck={d_lines[:5]}"
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_corpus)
def test_random_corpus_cross_engine_agreement(corpus):
    d = tempfile.mkdtemp(prefix="sg_hyp_")
    try:
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(corpus)), pa.int64()),
                "text": pa.array([r[0] for r in corpus], pa.string()),
                "lang": pa.array([r[2] for r in corpus], pa.string()),
                "source": pa.array([r[1] for r in corpus], pa.string()),
                "n_chars": pa.array([r[3] for r in corpus], pa.int64()),
            }
        )
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        for name in _LANES:
            df = QUERIES[name](_SPARK, d)
            cols = df.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_lines = sorted(
                "|".join(_norm(r[i]) for i in order) for r in df.collect()
            )
            res = con.execute(ORACLE[name])
            o_cols = [c[0] for c in res.description]
            oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            d_lines = sorted(
                "|".join(_norm(r[i]) for i in oo) for r in res.fetchall()
            )
            assert sorted(cols) == sorted(o_cols), name
            assert s_lines == d_lines, (
                f"{name} diverged on a {len(corpus)}-doc random corpus:\n"
                f"spark={s_lines[:5]}\nduck={d_lines[:5]}"
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)
