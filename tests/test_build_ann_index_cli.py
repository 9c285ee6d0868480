"""ANN-index-builder CLI: codebook + codes + recall-audit artifacts,
the notify seam, and bit-determinism (the train_tokenizer standard)."""

import pytest

pytestmark = pytest.mark.slow  # multi-session e2e; excluded from the driver-window run

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(work, vectors, out, notify, extra=()):
    return subprocess.run(
        [
            sys.executable,
            "-m",
            "glue_etl_nyc_yellow_taxi_analysis_spark.jobs.build_ann_index",
            "--vectors", vectors,
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
        l for l in stdout.splitlines() if l.startswith("ann index card: ")
    ][0]
    return json.loads(line.removeprefix("ann index card: "))


def test_build_ann_index_cli(spark, sf_dir, tmp_path):
    out = f"{tmp_path}/ann"
    r = _run_cli(
        tmp_path, f"{sf_dir}/embeddings.parquet", out, f"{tmp_path}/st.jsonl"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    assert card["m"] == 4 and card["k"] == 16
    assert card["bytes_per_vector_codes"] == 4
    # every vector encodes to exactly m code rows
    assert card["n_code_rows"] == card["n_vectors"] * card["m"]
    # codebook: at most m*k cells (empty clusters may drop out)
    assert 0 < card["codebook_cells"] <= card["m"] * card["k"]

    payloads = [json.loads(l) for l in open(f"{tmp_path}/st.jsonl")]
    assert payloads[-1]["state"] == "SUCCEEDED"

    # artifacts readable and consistent with the card
    codes = spark.read.parquet(f"{out}/codes.parquet")
    assert codes.count() == card["n_code_rows"]
    cb = spark.read.parquet(f"{out}/codebook.parquet")
    assert cb.count() == card["codebook_cells"]
    audit = {
        r["query_id"]: (r["hits_adc"], r["hits_rerank"], r["k"])
        for r in spark.read.parquet(f"{out}/recall.parquet").collect()
    }
    assert len(audit) == 3
    for q, (a, rr, k) in audit.items():
        assert 0 <= a <= rr <= k  # re-rank can only improve the shortlist
        assert card["audit"][str(q)] == {
            "hits_adc": a,
            "hits_rerank": rr,
            "k": k,
        }


def test_build_ann_index_deterministic(sf_dir, tmp_path):
    cards = []
    for i in (1, 2):
        out = f"{tmp_path}/rep{i}"
        r = _run_cli(
            tmp_path, f"{sf_dir}/embeddings.parquet", out, f"{out}.jsonl",
            extra=("--audit-queries", "2"),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        cards.append(_card(r.stdout))
    assert cards[0] == cards[1]
    assert len(cards[0]["audit"]) == 2
