"""Tokenizer-training CLI: merges + vocab + fertility artifacts, the
notify seam, and bit-determinism (same standard as pretrain_prep)."""

import pytest

pytestmark = pytest.mark.slow  # multi-session e2e; excluded from the driver-window run

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(work, docs, out, notify, extra=()):
    return subprocess.run(
        [
            sys.executable,
            "-m",
            "glue_etl_nyc_yellow_taxi_analysis_spark.jobs.train_tokenizer",
            "--docs", docs,
            "--output", out,
            "--notify-jsonl", notify,
            *extra,
        ],
        cwd=work,
        env={**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "8"},
        capture_output=True,
        text=True,
        timeout=1200,
    )


def _card(stdout):
    line = [
        l for l in stdout.splitlines() if l.startswith("tokenizer card: ")
    ][0]
    return json.loads(line.removeprefix("tokenizer card: "))


def test_train_tokenizer_cli(spark, sf_dir, tmp_path):
    out = f"{tmp_path}/tok"
    r = _run_cli(
        tmp_path, f"{sf_dir}/documents.parquet", out, f"{tmp_path}/st.jsonl"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    assert card["n_merges_learned"] == card["n_merges_requested"] == 12
    # compression: post-BPE symbols strictly below characters-per-token
    # baseline (= every merge used), yet >= one symbol per token
    assert card["n_tokens"] <= card["n_symbols_after_bpe"]
    assert sum(
        t for t, _ in card["fertility_by_source"].values()
    ) == card["n_tokens"]

    payloads = [json.loads(l) for l in open(f"{tmp_path}/st.jsonl")]
    assert payloads[-1]["state"] == "SUCCEEDED"

    # artifacts readable; merges agree with the card; vocab covers
    # every merged symbol
    merges = {
        r["step"]: (r["lsym"], r["rsym"])
        for r in spark.read.parquet(f"{out}/merges.parquet").collect()
    }
    assert [list(merges[s]) for s in sorted(merges)] == card["merges"]
    vocab = {
        r["symbol"] for r in spark.read.parquet(f"{out}/vocab.parquet").collect()
    }
    assert len(vocab) == card["vocab_size"]
    # a learned merge may itself be merged away later; the FINAL merge
    # product always survives in some word's segmentation
    last = merges[max(merges)]
    assert (last[0] + last[1]) in vocab
    fert = spark.read.parquet(f"{out}/fertility.parquet")
    assert fert.count() == len(card["fertility_by_source"])


def test_train_tokenizer_deterministic(sf_dir, tmp_path):
    cards = []
    for i in (1, 2):
        out = f"{tmp_path}/rep{i}"
        r = _run_cli(
            tmp_path, f"{sf_dir}/documents.parquet", out, f"{out}.jsonl",
            extra=("--merges", "6"),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        cards.append(_card(r.stdout))
    assert cards[0] == cards[1]
    assert cards[0]["n_merges_learned"] == 6
