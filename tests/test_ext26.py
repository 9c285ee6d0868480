"""Behavioral tests for the ext26 corpus-curation selection lanes."""

from collections import defaultdict

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_dsir_weights_favor_target_language(spark, sf_dir):
    """DSIR with target=en must, on average, score en docs above zh docs
    (the likelihood ratio is literally built from the en slice)."""
    w = {r.doc_id: r.dsir_logratio for r in QUERIES["q_dsir_weights"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    lang = {r.doc_id: r.lang for r in docs.collect()}
    by_lang = defaultdict(list)
    for d, s in w.items():
        if s is not None:
            by_lang[lang[d]].append(s)
    mean = {k: sum(v) / len(v) for k, v in by_lang.items() if v}
    assert mean["en"] > mean["zh"]
    # weights exist for every doc with text
    assert len(w) == docs.count()


def test_domain_cap_admits_at_most_cap_per_source(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries_ext26 import _DOMAIN_CAP

    rows = QUERIES["q_domain_cap"](spark, sf_dir).collect()
    per_source = defaultdict(list)
    for r in rows:
        per_source[r.source].append(r)
    for src, rs in per_source.items():
        kept = sum(r.kept for r in rs)
        assert kept == min(_DOMAIN_CAP, len(rs))
        # cap_rank is a permutation of 1..n within the source
        assert sorted(r.cap_rank for r in rs) == list(range(1, len(rs) + 1))
        # the kept set is exactly the best-priority prefix
        for r in rs:
            assert r.kept == (1 if r.cap_rank <= _DOMAIN_CAP else 0)


def test_domain_cap_is_deterministic_across_runs(spark, sf_dir):
    a = sorted(map(tuple, QUERIES["q_domain_cap"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_domain_cap"](spark, sf_dir).collect()))
    assert a == b


def test_token_fertility_sane(spark, sf_dir):
    rows = {r.lang: r for r in QUERIES["q_token_fertility"](spark, sf_dir).collect()}
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows.values()) == total_docs
    for r in rows.values():
        assert r.n_words > 0 and r.n_bpe_tokens > 0
        # BPE-ish tokens split words, never merge across whitespace
        assert r.fertility_ppm >= 1_000_000


def test_minhash_calibration_error_profile_sane(spark, sf_dir):
    """Estimator error is bounded ppm math: buckets in 0..10, mean <= max,
    and the planted high-jaccard pairs dominate the profile."""
    rows = QUERIES["q_minhash_calibration"](spark, sf_dir).collect()
    assert rows
    total_pairs = 0
    for r in rows:
        assert 0 <= r.jaccard_tenth <= 10
        assert 0 <= r.mean_abs_err_ppm <= r.max_abs_err_ppm <= 1_000_000
        total_pairs += r.n_pairs
    # candidate pairs exist (the generator plants ~5% near-dups)
    assert total_pairs > 0
    # most candidates come from genuinely similar docs (tenth >= 5)
    high = sum(r.n_pairs for r in rows if r.jaccard_tenth >= 5)
    assert high >= total_pairs // 2


def test_ccnet_buckets_are_balanced_terciles(spark, sf_dir):
    rows = QUERIES["q_ccnet_buckets"](spark, sf_dir).collect()
    per_lang = defaultdict(list)
    for r in rows:
        assert r.ppl_bucket in (1, 2, 3)
        per_lang[r.lang].append(r)
    for lang, rs in per_lang.items():
        sizes = defaultdict(int)
        for r in rs:
            sizes[r.ppl_bucket] += 1
        if len(rs) >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1
        # bucket 1 holds the highest scores: its min >= bucket 3's max
        b1 = [r.mean_logprob for r in rs if r.ppl_bucket == 1]
        b3 = [r.mean_logprob for r in rs if r.ppl_bucket == 3]
        if b1 and b3:
            assert min(b1) >= max(b3)
