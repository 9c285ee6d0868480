"""Adversarial-input smoke: the corners the sf fixtures never carry.

The r3/r4 advisory findings were all of one class — queries that are
hash-green on the well-behaved fixtures but diverge or crash on data the
fixtures lack (empty text, sub-n-gram docs, NULL fields, empty/short
vectors).  This suite runs the Spark side of the riskiest text/vector
queries over a deliberately hostile corpus and asserts they complete
with sane outputs (no ANSI crash, no phantom rows).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile")
    docs = pa.table(
        {
            "doc_id": pa.array(range(9), pa.int64()),
            "text": pa.array(
                [
                    "",                       # empty
                    "   ",                    # whitespace-only
                    "a",                      # 1 char
                    "hi",                     # 2 chars (sub-trigram)
                    "one",                    # single token
                    "tok tok tok tok",        # all-repeat
                    "héllo wörld 你好 мир",    # non-ascii
                    ("spark " * 200).strip(), # long, one-token vocab
                    None,                     # NULL text (r4 advisory)
                ]
            ),
            "lang": pa.array(["en"] * 7 + [None, "en"]),
            "source": pa.array([None, "s1", "s1", "s2", "s2", "s3", "s3", "s3", "s1"]),
            "n_chars": pa.array([0, 3, 1, 2, 3, 15, 20, 1199, None], pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    emb = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array(
                [
                    [],                     # empty vector
                    [0.1, 0.2],             # dim 2 (< 3)
                    [0.0] * 64,             # zero vector
                    [0.1] * 64,
                    [-0.2] * 64,
                    [0.05] * 64,
                ],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 1, 1, 2, 2], pa.int32()),
        }
    )
    pq.write_table(emb, str(d / "embeddings.parquet"))
    return str(d)


TEXT_QUERIES = [
    ("q_repetition_ratio", 9),   # 0/0 bigram guard (single-token docs)
    ("q_char_ngram_profile", None),  # descending-sequence guard (<3 chars)
    ("q_token_entropy", 8),     # NULL text → no token rows (oracle unnest agrees)
    ("q_text_stats", 9),
    ("q_lang_id", 9),
    ("q_quality_classifier", 9),
    ("q_batch_padding_plan", None),
    ("q_doc_fingerprint", 9),
    # real codec lanes: NULL/empty/non-ascii text must encode+decode
    # clean (the ORACLE equivalence needs ASCII, but the Spark side must
    # survive any utf-8 — non-ascii payloads exercise multibyte bytes)
    ("q_wav_decode", 9),
    ("q_bmp_decode", 9),
]


@pytest.mark.parametrize("name,n_rows", TEXT_QUERIES)
def test_text_queries_survive_hostile_docs(spark, hostile_dir, name, n_rows):
    rows = QUERIES[name](spark, hostile_dir).collect()
    if n_rows is not None:
        assert len(rows) == n_rows
    else:
        assert rows is not None  # completed without ANSI crash


def test_array_ops_null_not_crash_on_short_vectors(spark, hostile_dir):
    rows = {r.vec_id: r for r in QUERIES["q_array_ops"](spark, hostile_dir).collect()}
    assert len(rows) == 6
    assert rows[0].mean_val is None          # empty vector → NULL, not 0/0 crash
    assert rows[0].third_smallest is None
    assert rows[1].third_smallest is None    # dim-2 → NULL, not index error
    assert rows[3].third_smallest is not None


def test_similarity_topk_handles_zero_and_short_vectors(spark, hostile_dir):
    # query vectors include the empty and dim-2 vectors; cosine against
    # mismatched/zero vectors must yield NULL (try_divide), never crash
    rows = QUERIES["q_similarity_topk"](spark, hostile_dir).collect()
    assert rows is not None


def test_ngram_jaccard_null_block_pairs_nothing(spark, hostile_dir):
    """Docs with a NULL source/lang must not pair under a phantom block —
    the NULL-propagating key joins with nothing (both engines)."""
    rows = QUERIES["q_ngram_jaccard"](spark, hostile_dir).collect()
    ids_in_pairs = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert 0 not in ids_in_pairs  # NULL source
    assert 7 not in ids_in_pairs  # NULL lang


def test_minhash_survives_hostile_docs(spark, hostile_dir):
    # undeclared production-hash lane (xxhash64 bands — no SQL oracle);
    # its hash-exact twin q_minhash_dedup_oracle owns driver coverage
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import (
        q_dedup_fuzzy_minhash,
    )

    rows = q_dedup_fuzzy_minhash(spark, hostile_dir).collect()
    # empty/whitespace docs share the single shingle "" → they MAY pair
    # (documented tokens() contract); the pipeline itself must not crash
    assert rows is not None


# Queries whose Spark output must agree with the DuckDB oracle VALUE-wise
# on the hostile corpus (row counts alone hide per-row divergences like the
# r4 arrow_map NULL-text finding).  Only scalar-output queries qualify
# (list/struct cells don't normalize the same way).
HOSTILE_ORACLE_QUERIES = [
    # text lane (NULL/empty/sub-trigram/non-ascii documents)
    "q_text_stats",
    "q_repetition_ratio",
    "q_token_entropy",
    "q_lang_id",
    "q_quality_classifier",
    "q_doc_fingerprint",
    "q_batch_padding_plan",
    # embedding lane (empty / dim-2 / all-zero vectors)
    "q_array_ops",
    "q_embedding_dim_stats",
    "q_similarity_topk",
    "q_semdedup",
    # sketch lane (r6): tokenize → hash32 → fixed-size summaries; NULL
    # text must drop identically and non-ascii tokens must hash the
    # same UTF-8 bytes on both engines.  (The codec decode lanes are
    # deliberately ABSENT: their oracles replay bytes positionally from
    # text via ascii(), an equivalence that only holds on ASCII docs.)
    "q_cms_heavy_hitters",
    "q_sketch_merge",
    # ext29 text lanes: sub-bigram docs vanish identically on both
    # engines (slice/arrays_zip vs range(1, len)), NULL text drops, and
    # the all-repeat + long single-vocab docs stress the count joins
    "q_kn_bigram_ppl",
    "q_ngram_novelty",
    # NULL/zero n_chars docs own empty intervals and must vanish from the
    # draw space identically on both engines
    "q_weighted_sample",
    # decimal-routed float lane: NULL text drops, the [""] empty-doc term
    # and single-token docs must weight identically on both engines
    "q_lsa_topic",
    # ext30 web-curation lanes: NULL source ⇒ NULL URL group / NULL
    # window partition, NULL text ⇒ zero tokens & no gram rows, NULL
    # n_chars ⇒ NULLS LAST ordering — each must resolve identically
    "q_url_canonicalize",
    "q_keyword_tag",
    "q_token_budget_pack",
    "q_bleu_pairs",
    # ext31: NULL text drops from shingles/bigrams identically; a corpus
    # with no 'dup' marker must yield NULL AUC (not 0/0) on both
    # engines; NULL n_chars is excluded from l counts by both
    "q_hll_distinct",
    "q_quality_auc",
    "q_l_diversity",
    # ext32: NULL-text docs must drop from ROUGE pairing (no grams) and
    # count as clean 0-token docs in the blocklist gate; sub-bigram docs
    # force NULL rouge-2 (never 0/0); NULL n_chars/n_types rank under
    # NULLS FIRST identically on both engines
    "q_rouge_pairs",
    "q_rank_correlation",
    "q_blocklist_filter",
    # ext33: NULL text drops from candidate generation identically; a
    # query with candidates but no fully-relevant doc must emit
    # rr_e6 = 0 (never a dropped row), and per-query NDCG pools of
    # 1-2 docs exercise the k > pool-size edge on both engines
    "q_ndcg_at_k",
    "q_mrr",
    # ext34: NULL text contributes 0 tokens; a NULL source forms its
    # own weight group on both engines
    "q_mixture_temperature",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v) if v == v else "nan"
    return str(v)


@pytest.mark.parametrize("name", HOSTILE_ORACLE_QUERIES)
def test_hostile_corpus_oracle_agreement(spark, hostile_dir, name):
    """Bit-exact Spark-vs-DuckDB agreement on the hostile corpus — the
    fixture-blind divergence gate the sf fixtures can't provide."""
    import duckdb

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE

    df = QUERIES[name](spark, hostile_dir)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    s_lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in df.collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{hostile_dir}/{t}.parquet'"
        )
    res = con.execute(ORACLE[name])
    o_cols = [d[0] for d in res.description]
    oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    d_lines = sorted("|".join(_norm(r[i]) for i in oo) for r in res.fetchall())
    assert sorted(cols) == sorted(o_cols)
    assert s_lines == d_lines


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    """Events corpus the sf fixtures never carry: duplicate (user_id, ts)
    pairs straddling a session boundary (the r4 tiebreak advisory), NULL
    user_id / value / event_type / props, an exact-gap event, and
    out-of-vocabulary event types."""
    import datetime as dt

    d = tmp_path_factory.mktemp("hostile_events")
    T = dt.datetime(2024, 1, 1, 10, 0, 0)
    s = lambda sec: T + dt.timedelta(seconds=sec)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, s(0), 1, "view", 1.0, '{"k": 1}'),
        (1, s(600), 1, "click", 2.5, '{"k": 2}'),
        (2, s(2400), 1, "purchase", 0.0, "{}"),        # gap 1800 exact: SAME session
        (3, s(4201), 1, "view", -3.25, None),          # gap 1801: NEW session
        # user 2: three tied-timestamp events right after a boundary
        (4, s(0), 2, "view", 10.0, '{"k": 3}'),
        (5, s(1801), 2, "click", 1.0, '{"k": 4}'),     # boundary crosser
        (6, s(1801), 2, "click", 2.0, '{"k": 5}'),     # tied with 5
        (7, s(1801), 2, "error", None, '{"k": 6}'),    # tied, NULL value
        # user 3: NULL-heavy
        (8, s(100), 3, None, None, None),
        (9, s(200), 3, "view", 4.0, '{"k": 7}'),
        # NULL user_id partition
        (10, s(300), None, "click", 5.0, '{"k": 8}'),
        (11, s(2200), None, "view", 6.0, '{"k": 9}'),
        # out-of-vocabulary event type
        (12, s(400), 4, "zz_unknown", 7.5, '{"k": 10}'),
        # NULL ts: the engine contract is Spark's native ordering (NULL
        # sorts FIRST ascending); oracles spell NULLS FIRST explicitly.
        # User 5 carries a NULL-ts row AND a multi-event session AND a
        # >30-min-gap pair, so session NUMBERING diverges between
        # NULLS-FIRST and NULLS-LAST orderings: Spark sees sessions
        # {13}, {14,15}, {16} while a NULLS-LAST oracle would number
        # them {14,15}=1, {16}=2, {13}=3 (r5 advisory).
        (13, None, 5, "view", 8.0, '{"k": 11}'),
        (14, s(500), 5, "click", 9.0, '{"k": 12}'),
        (15, s(900), 5, "view", 9.5, '{"k": 13}'),     # same session as 14
        (16, s(3000), 5, "purchase", 10.0, '{"k": 14}'),  # gap 2100s: NEW session
    ]
    docs = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(docs, str(d / "events.parquet"))
    return str(d)


# Events-lane agreement set: scalar outputs, oracle reads only `events`.
HOSTILE_EVENTS_QUERIES = [
    "q_session_windows",     # the r4 tiebreak advisory target
    "q_event_sessionize",
    "q_lag_lead_delta",
    "q_running_total",
    "q_markov_transitions",
    "q_time_weighted_avg",
    "q_islands_gaps",
    "q_sliding_windows",
    "q_funnel",
    "q_attribution",
    "q_event_pattern",
    "q_ewma_smooth",
    # second tranche: joins/CDC/json/frames over the same corpus
    "q_asof_join",
    "q_range_join_bands",
    "q_dedup_keyed",
    "q_scd2_history",
    "q_scd2_pit",
    "q_date_trunc",
    "q_json_extract",
    "q_variant_json",
    "q_interval_overlap",
    "q_trailing_window_range",
    "q_global_index",
    "q_bitwise_ops",
    "q_salt_plan",
    "q_bitmap_distinct",
]


@pytest.mark.parametrize("name", HOSTILE_EVENTS_QUERIES)
def test_hostile_events_oracle_agreement(spark, hostile_events_dir, name):
    import duckdb

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE

    df = QUERIES[name](spark, hostile_events_dir)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    s_lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in df.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{hostile_events_dir}/events.parquet'"
    )
    res = con.execute(ORACLE[name])
    o_cols = [d[0] for d in res.description]
    oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    d_lines = sorted("|".join(_norm(r[i]) for i in oo) for r in res.fetchall())
    assert sorted(cols) == sorted(o_cols)
    assert s_lines == d_lines


def test_arrow_map_null_text_matches_oracle(spark, hostile_dir):
    """q_arrow_map must agree with its DuckDB oracle on NULL text: both
    engines yield NULL n_bytes / NULL byte_sum (not 0/0) for the NULL-text
    doc — the r4 advisory's latent per-row divergence."""
    import duckdb

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE

    s_rows = {
        r.doc_id: (r.n_bytes, r.byte_sum)
        for r in QUERIES["q_arrow_map"](spark, hostile_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    d_rows = {
        r[0]: (r[1], r[2]) for r in con.execute(ORACLE["q_arrow_map"]).fetchall()
    }
    assert s_rows == d_rows
    assert s_rows[8] == (None, None)  # NULL text → NULL stats on both engines


def test_arrow_grouped_null_text_matches_oracle(spark, hostile_dir):
    """q_arrow_grouped must apply SQL aggregate NULL semantics: the
    NULL-text doc counts toward n_docs but is skipped by SUM/MAX."""
    import duckdb

    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE

    s_rows = {
        r.source: (r.n_docs, r.total_bytes, r.max_doc_bytes, r.byte_sum)
        for r in QUERIES["q_arrow_grouped"](spark, hostile_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    d_rows = {
        r[0]: tuple(r[1:])
        for r in con.execute(ORACLE["q_arrow_grouped"]).fetchall()
    }
    assert s_rows == d_rows


def test_tokenizer_whitespace_class_matches_duckdb_on_vertical_tab(spark):
    """Java's \\s includes \\x0B, RE2's does not — both tokenizer lanes
    spell the whitespace class out explicitly, so a vertical-tab doc must
    tokenize identically on Spark and DuckDB (every TOKS_SQL consumer
    rides this contract)."""
    import duckdb
    import pyspark.sql.functions as F

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import TOKS_SQL

    raw = "Alpha\x0bbeta\tgamma \x0b delta-5!"
    spark_toks = (
        spark.range(1)
        .select(text.tokens(F.lit(raw)).alias("t"))
        .collect()[0]
        .t
    )
    duck_toks = duckdb.connect().execute(
        f"SELECT {TOKS_SQL.format(c='?')}", [raw]
    ).fetchone()[0]
    assert spark_toks == duck_toks
    assert spark_toks == ["alpha", "beta", "gamma", "delta-5!"]

    spark_bpe = (
        spark.range(1)
        .select(
            F.regexp_extract_all(
                F.lit(raw), F.lit(text.BPE_TOKEN_PATTERN), F.lit(0)
            ).alias("t")
        )
        .collect()[0]
        .t
    )
    duck_bpe = duckdb.connect().execute(
        "SELECT regexp_extract_all(?, ?)", [raw, text.BPE_TOKEN_PATTERN]
    ).fetchone()[0]
    # \x0B must be whitespace (never a symbol token) on BOTH engines
    assert spark_bpe == duck_bpe
    assert "\x0b" not in spark_bpe
