"""Behavioral tests for q_substr_dedup (ExactSubstr-style span removal)."""

import hashlib
from collections import Counter

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES

K = 8


def _replay(tok_lists):
    """Pure-python ExactSubstr replay: remove every K-gram occurring >= 2
    times corpus-wide, reconstruct in order."""
    counts = Counter()
    for toks in tok_lists.values():
        for i in range(len(toks) - K + 1):
            counts[" ".join(toks[i : i + K])] += 1
    out = {}
    for doc, toks in tok_lists.items():
        covered = set()
        for i in range(len(toks) - K + 1):
            if counts[" ".join(toks[i : i + K])] > 1:
                covered.update(range(i, i + K))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[doc] = (
            len(toks),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_substr_dedup_matches_python_replay(spark, sf_dir):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok_lists = {
        r["doc_id"]: list(r["toks"])
        for r in docs.select("doc_id", t.tokens("text").alias("toks")).collect()
    }
    expect = _replay(tok_lists)
    rows = QUERIES["q_substr_dedup"](spark, sf_dir).collect()
    assert len(rows) == len(tok_lists)
    removed_any = 0
    for r in rows:
        n, rm, h = expect[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["n_removed"] == rm
        assert r["kept_hash"] == h
        removed_any += rm > 0
    # the generator plants near-dup docs, so duplicated spans must exist
    assert removed_any > 0


def test_substr_dedup_planted_duplicate_fully_removed(spark):
    """Two docs sharing an identical 10-token run: every position of the
    run is covered in BOTH docs; unique text survives."""
    run = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, f"unique one {run}"),
            (2, f"{run} other tail entirely"),
            (3, "completely separate text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    df.write.mode("overwrite").parquet("/tmp/_ss_dedup_fixture/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in QUERIES["q_substr_dedup"](
            spark, "/tmp/_ss_dedup_fixture"
        ).collect()
    }
    # doc 1: 12 tokens, the 10-token run is covered (positions 2..11)
    assert rows[1]["n_removed"] == 10
    assert (
        rows[1]["kept_hash"]
        == hashlib.md5(b"unique one").hexdigest()
    )
    assert rows[2]["n_removed"] == 10
    assert (
        rows[2]["kept_hash"]
        == hashlib.md5(b"other tail entirely").hexdigest()
    )
    assert rows[3]["n_removed"] == 0
