"""Text-analysis + fuzzy-dedup operator tests.

Cross-validation strategy: MinHash-LSH and SimHash are hash-family-dependent
(no SQL oracle), so they are checked against the exact methods — planted
near-duplicates found by exact n-gram Jaccard must also be found by MinHash.
"""

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import dedup, text


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s1"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend", "en", "s1"),
        (3, "completely different content about spark query engines and shuffles", "en", "s1"),
        (4, "el rapido zorro marron salta sobre el perro perezoso en la ribera", "es", "s1"),
        (5, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_fingerprint_exact_dup(spark):
    docs = _docs(spark)
    groups = dedup.dedup_exact_docs(docs).collect()
    # docs 1 and 5 are identical text → one group with n_dups=2
    dups = [g for g in groups if g.n_dups == 2]
    assert len(dups) == 1 and dups[0].keep_id == 1
    assert len(groups) == 4


def test_ngram_jaccard_finds_neardup(spark):
    docs = _docs(spark)
    pairs = dedup.ngram_jaccard_pairs(
        docs, block_col="source", n=3, threshold=0.5
    ).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    assert 0.5 <= pairs[0].jaccard_sim < 1.0


def test_minhash_agrees_with_exact_jaccard(spark):
    docs = _docs(spark)
    pairs = dedup.minhash_dedup_pairs(docs, num_hashes=32, bands=8, threshold=0.5)
    got = {(p.id_a, p.id_b) for p in pairs.collect()}
    # exact dup (1,5) and near dup (1,2) must surface; (2,5) transitively
    assert (1, 5) in got and (1, 2) in got
    # verification step guarantees no false positives below threshold
    for p in pairs.collect():
        assert p.jaccard_sim >= 0.5


def test_simhash_production_wrapper(spark, sf_dir):
    """The undeclared production parameterization (q_dedup_simhash,
    xxhash64 lane, Hamming ≤ 8) — no SQL oracle (hash-family-dependent);
    its md5-lane twin q_simhash_oracle owns driver coverage.  Here:
    deterministic, symmetric-free (a<b), and within the Hamming bound."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.queries import q_dedup_simhash

    a = sorted(map(tuple, q_dedup_simhash(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_dedup_simhash(spark, sf_dir).collect()))
    assert a == b and a  # planted near-dups must surface
    rows = q_dedup_simhash(spark, sf_dir).collect()
    assert all(r.id_a < r.id_b and r.hamming <= 8 for r in rows)


def test_simhash_near_zero_hamming_for_dups(spark):
    docs = _docs(spark)
    # banded candidate generation guarantees exact/low-hamming pairs
    pairs = {(p.id_a, p.id_b): p.hamming for p in dedup.simhash_dedup_pairs(docs, max_hamming=16).collect()}
    assert pairs.get((1, 5)) == 0  # identical text → identical signature
    # signature property (unbanded): near-dup is closer than unrelated text
    sigs = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", text.tokens("text").alias("__toks")
        ).select("doc_id", dedup.simhash64("__toks").alias("s")).collect()
    }
    mask = (1 << 64) - 1  # signatures are signed longs; mask for popcount
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & mask).count("1")  # noqa: E731
    assert ham(1, 5) == 0
    assert ham(1, 2) < ham(1, 3)


def test_lang_id_on_clear_text(spark):
    rows = [
        (1, "the cat and the dog went to the house of a friend", "x"),
        (2, "el gato y el perro es un animal que vive en la casa", "x"),
        (3, "der hund und die katze ist ein tier von der stadt", "x"),
        (4, "xyzzy qwerty asdf", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.lang_pred for r in text.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_stats_values(spark):
    df = spark.createDataFrame([(1, "The cat, the hat!")], "doc_id long, text string")
    r = text.quality_stats(df).collect()[0]
    assert r.char_count == 17
    assert r.token_count == 4
    # letters runs: The cat the hat ; symbols: , !  → 6 BPE-ish tokens
    assert r.bpe_token_count == 6
    assert abs(r.punct_ratio - 2 / 17) < 1e-9
    # normalized tokens: the cat, the hat! → stopword 'the' twice
    assert abs(r.stopword_ratio - 0.5) < 1e-9


def test_winnow_selection_guarantee(spark):
    """Two docs sharing a run of ≥ window+n-1 words must share a
    fingerprint; disjoint texts share none."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "XX YY alpha beta gamma delta epsilon zeta eta theta ZZ"),  # shared 9-word run
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", text.winnow_fingerprints("text", n=3, window=4).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2], "shared run must produce a shared fingerprint"
    assert not (fps[1] & fps[3]), "disjoint texts share nothing"
    # winnowing selects a (typically strict) subset of the shingle stream
    n_sh = {
        r.doc_id: r.n
        for r in df.select("doc_id", F.size(text.shingles("text")).alias("n")).collect()
    }
    assert all(len(fps[d]) <= n_sh[d] for d in fps)


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    sh = df.select(text.shingles("text", 3).alias("s")).collect()[0].s
    assert sh == ["one two"]


def test_minhash_md5_lane_matches_xxhash_lane_semantics(spark):
    """The md5 (oracle) lane must surface the same verified near-dup pairs
    as the xxhash64 (throughput) lane — the hash family only steers
    candidate generation; the exact-Jaccard verify fixes the output."""
    docs = _docs(spark)
    got = {
        (p.id_a, p.id_b)
        for p in dedup.minhash_dedup_pairs(
            docs, num_hashes=12, bands=4, threshold=0.5, lane="md5"
        ).collect()
    }
    assert (1, 5) in got and (1, 2) in got
    ref = {
        (p.id_a, p.id_b)
        for p in dedup.minhash_dedup_pairs(
            docs, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert ref <= got or got <= ref  # both catch the planted pairs


def test_simhash_md5_lane_properties(spark):
    docs = _docs(spark)
    pairs = {
        (p.id_a, p.id_b): p.hamming
        for p in dedup.simhash_dedup_pairs(docs, max_hamming=16, lane="md5").collect()
    }
    assert pairs.get((1, 5)) == 0  # identical text → identical 60-bit signature
    # 60-bit signatures stay within the signed-long budget
    sigs = [
        r.s
        for r in _docs(spark)
        .select(dedup.tokens("text").alias("__toks"))
        .select(dedup.simhash60_md5("__toks").alias("s"))
        .collect()
    ]
    assert all(0 <= s < (1 << 60) for s in sigs)


def test_rep_centroids_deterministic(spark):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.9, 0.1], "a"),
        (3, [0.0, 1.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    reps = {r.cluster: r.centroid for r in similarity.rep_centroids(df).collect()}
    assert reps == {"a": [1.0, 0.0], "b": [0.0, 1.0]}


def test_minhash_signature_matches_seed_family_replay(spark):
    """The md5-lane signature must equal min(md5('<i>|' + shingle)) —
    the documented, oracle-replicable family — and be identical across
    separately built plans.  Regression: a two-parameter HOF lambda
    (`lambda s, i=i`) binds i to the ELEMENT-INDEX column, so the seed
    silently became the index column's run-varying repr and two plans
    (e.g. a stream probe vs its static index) could never agree on band
    keys."""
    import hashlib

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    row = dedup.minhash_signatures(
        df, num_hashes=4, shingle_n=3, lane="md5"
    ).collect()[0]
    expect = [
        min(
            hashlib.md5(f"{i}|{s}".encode()).hexdigest()
            for s in row["shingles"]
        )
        for i in range(4)
    ]
    assert list(row["minhash_sig"]) == expect
    # a second, separately built plan must produce identical values
    row2 = dedup.minhash_signatures(
        df, num_hashes=4, shingle_n=3, lane="md5", spread_input=False
    ).collect()[0]
    assert list(row2["minhash_sig"]) == expect
    # the xxhash lane: k seeds must be DISTINCT functions (the index-
    # column bug collapsed them all to xxhash64(s, element_index))
    rx = dedup.minhash_signatures(df, num_hashes=4, shingle_n=3).collect()[0]
    assert len(set(rx["minhash_sig"])) > 1


def test_prefix_join_equals_allpairs_on_hostile_corpus(spark, tmp_path):
    """The prefix-filtered exact similarity join (r6: the AllPairs/PPJoin
    re-plan of ngram_jaccard_pairs) must return BIT-identical pairs to
    the naive blocked O(m²) join on a corpus full of edge shapes: empty/
    whitespace/sub-n-gram docs, NULL text, NULL block, planted near-dups
    at/above/below the threshold, and docs with disjoint vocab."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import dedup

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "b1"),
        (1, "alpha beta gamma delta epsilon eta", "b1"),    # near-dup of 0
        (2, "alpha beta gamma delta epsilon zeta", "b1"),   # exact dup of 0
        (3, "totally different words here now", "b1"),
        (4, "alpha beta gamma delta epsilon zeta", "b2"),   # dup, other block
        (5, "", "b1"),
        (6, "   ", "b1"),
        (7, "hi", "b1"),
        (8, None, "b1"),                                    # NULL text
        (9, "alpha beta gamma delta epsilon zeta", None),   # NULL block
        (10, "one two three four five six seven eight nine ten", "b2"),
        (11, "one two three four five six seven XXX YYY ZZZ", "b2"),  # ~0.41
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "block": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    docs = spark.read.parquet(str(tmp_path / "docs.parquet"))
    got_prefix = sorted(
        map(tuple, dedup.ngram_jaccard_pairs(docs, block_col="block").collect())
    )
    got_naive = sorted(
        map(
            tuple,
            dedup.ngram_jaccard_pairs(
                docs, block_col="block", method="allpairs"
            ).collect(),
        )
    )
    assert got_prefix == got_naive
    pair_ids = {(a, b) for a, b, _ in got_prefix}
    assert (0, 1) in pair_ids and (0, 2) in pair_ids and (1, 2) in pair_ids
    assert not any(4 in p or 9 in p for p in pair_ids)  # block isolation
    # NULL/empty/whitespace docs all normalize to the single '' shingle
    # (documented tokens() contract) — they may pair with each OTHER but
    # never with a real document
    for a, b in pair_ids:
        if a in {5, 6, 8} or b in {5, 6, 8}:
            assert a in {5, 6, 8} and b in {5, 6, 8}, (a, b)
