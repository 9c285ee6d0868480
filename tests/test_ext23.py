"""Behavioral tests for the round-3 eighth-pass batch (queries_ext23)."""

import hashlib
from collections import Counter

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_span_mask_plan_matches_python_replay(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_lists = {
        r["doc_id"]: list(r["toks"])
        for r in docs.select("doc_id", t.tokens("text").alias("toks")).collect()
    }
    rows = QUERIES["q_span_mask_plan"](spark, sf_dir).collect()
    assert len(rows) == len(tok_lists)
    masked_any = 0
    for r in rows:
        toks = tok_lists[r["doc_id"]]
        n = len(toks)
        starts = [
            p
            for p in range(n)
            if int(
                hashlib.md5(f"{r['doc_id']}|{p}".encode()).hexdigest()[:8], 16
            )
            % 20
            == 0
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + 2, n - 1) + 1))
        corrupted = [
            "<X>" if p in covered else toks[p] for p in range(n)
        ]
        assert r["n_tokens"] == n
        assert r["n_spans"] == len(starts)
        assert r["n_masked"] == len(covered)
        assert r["mask_ppm"] == (len(covered) * 1_000_000 // n if n else 0)
        assert (
            r["corrupted_hash"]
            == hashlib.md5(" ".join(corrupted).encode()).hexdigest()
        )
        masked_any += len(covered) > 0
    # ~5% start rate: a short doc can draw zero spans, but the bulk of
    # the corpus must actually mask
    assert masked_any > len(rows) * 0.8


def test_dataset_card_matches_python_replay(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    recs = docs.select(
        "doc_id", "text", "source", "lang", "n_chars", t.tokens("text").alias("toks")
    ).collect()
    row = QUERIES["q_dataset_card"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == len(recs)
    assert row["n_chars"] == sum(r["n_chars"] for r in recs)
    assert row["n_tokens"] == sum(len(r["toks"]) for r in recs)
    assert row["n_sources"] == len({r["source"] for r in recs})
    assert row["n_langs"] == len({r["lang"] for r in recs})
    vocab = set()
    for r in recs:
        vocab.update(r["toks"])
    assert row["vocab"] == len(vocab)
    lens = sorted(len(r["toks"]) for r in recs)
    m = len(lens)
    median = (
        lens[m // 2]
        if m % 2
        else (lens[m // 2 - 1] + lens[m // 2]) / 2
    )
    assert row["median_doc_tokens"] == int(median // 1)
    texts = Counter(r["text"] for r in recs)
    n_dup = sum(c for c in texts.values() if c > 1)
    assert row["n_dup_docs"] == n_dup
    assert row["dup_ppm"] == n_dup * 1_000_000 // len(recs)


def test_audio_energy_windows_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = QUERIES["q_audio_energy_windows"](spark, sf_dir).collect()
    assert len(rows) == len(texts)
    for r in rows[:100]:
        data = texts[r["media_id"]].encode()
        arr = np.frombuffer(data, dtype=np.uint8)
        n_win = -(-len(arr) // 64) if len(arr) else 0
        energies = [int(arr[w * 64 : (w + 1) * 64].sum()) for w in range(n_win)]
        assert r["n_bytes"] == len(arr)
        assert r["n_windows"] == n_win
        assert r["peak_energy"] == (max(energies) if energies else 0)
        assert r["peak_window"] == (
            energies.index(max(energies)) if energies else 0
        )
        assert (
            r["energy_md5"]
            == hashlib.md5(",".join(map(str, energies)).encode()).hexdigest()
        )


def test_image_blockhash_matches_python_replay(spark, sf_dir):
    """Replay the blockhash signature + banding + Hamming verify in
    pure python over the raw bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def blockhash(text):
        codes = [ord(c) for c in text]
        n = len(codes)
        total = sum(codes)
        h = 0
        for b in range(60):
            s, e = b * n // 60, (b + 1) * n // 60
            w = e - s
            if w > 0 and sum(codes[s:e]) * n >= total * w:
                h |= 1 << b
        return h
    hashes = {d: blockhash(t) for d, t in texts.items()}
    # expected pairs: banded candidates (any 15-bit band equal), hamming<=15
    from collections import defaultdict

    buckets = defaultdict(list)
    for d, h in hashes.items():
        for b in range(4):
            buckets[(b, (h >> (15 * b)) & 32767)].append(d)
    expect = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, c = ids[i], ids[j]
                if bin(hashes[a] ^ hashes[c]).count("1") <= 15:
                    expect.add((a, c))
    rows = QUERIES["q_image_blockhash_neardup"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == expect
    for r in rows:
        assert r["h_a"] == hashes[r["id_a"]]
        assert r["h_b"] == hashes[r["id_b"]]
        assert r["hamming"] == bin(r["h_a"] ^ r["h_b"]).count("1")


def test_video_scene_cut_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = QUERIES["q_video_scene_cut"](spark, sf_dir).collect()
    assert len(rows) == sum(1 for t in texts.values() if len(t) > 0)
    for r in rows[:150]:
        codes = [ord(c) for c in texts[r["media_id"]]]
        n = len(codes)
        n_frames = -(-n // 128)
        e = [sum(codes[f * 128 : (f + 1) * 128]) for f in range(n_frames)]
        cuts = [
            i
            for i in range(1, n_frames)
            if abs(e[i] - e[i - 1]) * 10 > e[i] + e[i - 1]
        ]
        assert r["n_frames"] == n_frames
        assert r["n_cuts"] == len(cuts)
        assert r["first_cut"] == (cuts[0] if cuts else -1)
        assert (
            r["cut_hash"]
            == hashlib.md5(",".join(map(str, cuts)).encode()).hexdigest()
        )


def test_langid_confusion_partitions_and_diagonal(spark, sf_dir):
    rows = QUERIES["q_langid_confusion"](spark, sf_dir).collect()
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == total_docs
    # per-true-class shares sum to ~1e6 (integer-floor loss only)
    from collections import defaultdict

    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
        n_true = sum(x["n"] for x in by_lang[r["lang"]])
    for lang, cells in by_lang.items():
        n_true = sum(c["n"] for c in cells)
        for c in cells:
            assert c["share_of_true_ppm"] == c["n"] * 1_000_000 // n_true
    # the en stopword voter must beat chance on labeled en docs
    en = {c["lang_pred"]: c["n"] for c in by_lang.get("en", [])}
    assert en.get("en", 0) > sum(en.values()) // 2


def test_embedding_outliers_matches_numpy_replay(spark, sf_dir):
    import math

    import numpy as np

    tab = __import__("pyarrow.parquet", fromlist=["pq"]).read_table(
        f"{sf_dir}/embeddings.parquet"
    ).to_pydict()
    mat = np.array(tab["embedding"], dtype=np.float32).astype(np.float64)
    ve4 = np.floor(mat * 1e4 + 0.5).astype(np.int64)
    n2 = (ve4 * ve4).sum(axis=1)
    n = len(n2)
    s, ss = int(n2.sum()), int((n2.astype(object) * n2.astype(object)).sum())
    mean = s / n
    var = (n * float(ss) - float(s) * float(s)) / (n * n)
    from collections import Counter

    bands = Counter(math.floor((v - mean) / math.sqrt(var) * 2) for v in n2)
    rows = {r["z_band"]: r for r in QUERIES["q_embedding_outliers"](spark, sf_dir).collect()}
    assert {b: r["n_vecs"] for b, r in rows.items()} == dict(bands)
    assert sum(r["n_vecs"] for r in rows.values()) == n


def test_length_moments_matches_scipy_style_replay(spark, sf_dir):
    import math
    from collections import defaultdict

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    by_src = defaultdict(list)
    for r in docs.select("source", "n_chars").collect():
        by_src[r["source"]].append(r["n_chars"])
    rows = {r["source"]: r for r in QUERIES["q_length_moments"](spark, sf_dir).collect()}
    assert set(rows) == set(by_src)
    for src, xs in by_src.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
        m4 = (
            s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
            - 3 * mu * mu * mu * mu
        )
        r = rows[src]
        assert r["n"] == n
        assert r["mean_milli"] == math.floor(mu * 1e3 + 0.5)
        assert r["skew_e6"] == math.floor(m3 / (m2 * math.sqrt(m2)) * 1e6 + 0.5)
        assert r["kurt_e6"] == math.floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5)
