"""End-to-end pretraining-prep CLI: the FULL curation stack in one
Spark session (funnel → exact+fuzzy dedup → contamination → DSIR ×
mixture admission → pack → split → card).

The small-SF test pins exact accounting reconciliation and output
properties; the sf1 test (skipped unless the generated corpus exists —
``python tools/gen_scale_data.py /tmp/sg_sf1 --docs 50000 --vectors
20000``) exercises the composed DAG's cache/checkpoint boundaries and
memory pressure at 10× the bench SF and prints the wall time the
round's SCALE notes record.
"""

import pytest

pytestmark = pytest.mark.slow  # multi-session e2e; excluded from the driver-window run

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sg_sf1")


def _run_cli(work, source, out, notify, extra=()):
    return subprocess.run(
        [
            sys.executable,
            "-m",
            "glue_etl_nyc_yellow_taxi_analysis_spark.jobs.pretrain_prep",
            "--source", source,
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
        l for l in stdout.splitlines() if l.startswith("pretrain card: ")
    ][0]
    return json.loads(line.removeprefix("pretrain card: "))


def _assert_card_reconciles(card):
    assert (
        card["input_docs"]
        - card["removed_quality"]
        - card["removed_exact_dup"]
        - card["removed_near_dup"]
        - card["removed_benchmark"]
        - card["removed_contaminated"]
        - card["removed_over_quota"]
        == card["kept"]
    )
    # funnel is monotone non-increasing and ends at the quality survivors
    fp = card["funnel_pass"]
    assert fp["len"] >= fp["wordlen"] >= fp["stopword"] >= fp["ttr"]
    assert card["input_docs"] - card["removed_quality"] == fp["ttr"]
    assert card["kept"] == sum(n for n, _ in card["splits"].values())
    assert card["kept_tokens"] == sum(t for _, t in card["splits"].values())
    assert card["kept_tokens"] <= card["token_budget"]
    # every source stays within its quota's neighborhood: the admission
    # window never exceeds the GLOBAL budget
    assert sum(card["tokens_by_source"].values()) == card["kept_tokens"]


def test_pretrain_prep_cli(spark, sf_dir, tmp_path):
    out = f"{tmp_path}/prepared"
    notify = f"{tmp_path}/state.jsonl"
    r = _run_cli(
        tmp_path, f"{sf_dir}/documents.parquet", out, notify
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    _assert_card_reconciles(card)
    assert card["removed_quality"] > 0  # the corpus has short docs
    assert card["removed_near_dup"] > 0  # ... and planted near-dups
    assert card["removed_over_quota"] > 0  # default budget halves tokens

    payloads = [json.loads(l) for l in open(notify)]
    assert payloads[-1]["state"] == "SUCCEEDED"

    # output readable, partitioned by split; pack ids contiguous-ish
    # (every pack below the max id is populated — the running sum has
    # no holes); internals never land in the written corpus
    import pyspark.sql.functions as F

    got = spark.read.parquet(f"{out}/corpus")
    assert not [c for c in got.columns if c.startswith("__")]
    by_split = {
        r["split"]: (r["n"], r["t"])
        for r in got.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").cast("long").alias("t"))
        .collect()
    }
    assert {k: list(v) for k, v in by_split.items()} == {
        k: list(v) for k, v in card["splits"].items()
    }
    packs = sorted(r["pack_id"] for r in got.select("pack_id").distinct().collect())
    assert packs[0] == 0 and packs == list(range(len(packs)))
    assert len(packs) == card["n_packs"]
    assert got.filter((F.col("shard") < 0) | (F.col("shard") >= 8)).count() == 0


def test_pretrain_prep_null_source(spark, sf_dir, tmp_path):
    """NULL-source docs get their OWN quota bucket instead of being
    silently dropped at the admission join (advisor r7: a plain
    equi-join on source never matches NULL, so every NULL-source doc
    vanished — misattributed to removed_over_quota — while its tokens
    still inflated the share denominators).  The driver corpus has no
    NULL sources, so this plants them: every doc_id % 7 == 0 loses its
    source, and the written corpus must still contain NULL-source docs
    in rough proportion to their share."""
    import pyspark.sql.functions as F

    src = f"{tmp_path}/docs_null_source"
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                F.col("source")
            ),
        )
        .write.parquet(src)
    )
    out = f"{tmp_path}/prepared"
    r = _run_cli(tmp_path, src, out, f"{tmp_path}/state.jsonl")
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    _assert_card_reconciles(card)
    got = spark.read.parquet(f"{out}/corpus")
    n_null_kept = got.filter(F.col("source").isNull()).count()
    assert n_null_kept > 0, "NULL-source docs were dropped at admission"
    # the card's per-source rollup carries the NULL bucket too
    # (keyed "<null>" — JSON objects need string keys)
    assert "<null>" in card["tokens_by_source"]
    # and the NULL bucket respects its own quota: the global budget
    # still binds (reconciliation above already pins the sum)
    assert card["kept_tokens"] <= card["token_budget"]


def test_pretrain_prep_bpe_packing(spark, sf_dir, tmp_path):
    """--bpe-merges N: the job trains a BPE tokenizer on the ADMITTED
    corpus, encodes every admitted doc, and budgets the pack stage in
    learned-tokenizer tokens (the q_bpe_pack composition).  The card
    must carry the tokenizer block (merge list, exact-integer
    fertility), the pack ids must stay hole-free, and everything
    upstream of packing must be UNCHANGED vs the whitespace-count run —
    the tokenizer stage may not perturb admission."""
    import pyspark.sql.functions as F

    out = f"{tmp_path}/prepared_bpe"
    r = _run_cli(
        tmp_path,
        f"{sf_dir}/documents.parquet",
        out,
        f"{tmp_path}/state.jsonl",
        extra=("--bpe-merges", "6"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    _assert_card_reconciles(card)

    tok = card["tokenizer"]
    assert tok["n_merges"] == 6
    assert len(tok["merges"]) == 6
    # every merge is the concatenation of two non-empty symbols
    assert all(len(m) >= 2 for m in tok["merges"])
    # fertility = post-BPE symbols per word token: ≥ 1 by construction
    # (a word is at least one symbol), < the pre-merge char count
    assert tok["fertility_e6"] >= 1_000_000
    assert "bpe_tokenizer" in card["stage_wall_sec"]

    got = spark.read.parquet(f"{out}/corpus")
    assert not [c for c in got.columns if c.startswith("__")]
    packs = sorted(
        r["pack_id"] for r in got.select("pack_id").distinct().collect()
    )
    assert packs[0] == 0 and packs == list(range(len(packs)))
    assert len(packs) == card["n_packs"]

    # upstream accounting identical to the no-tokenizer run: the BPE
    # stage only changes what packs count, never what is admitted
    r0 = _run_cli(
        tmp_path, f"{sf_dir}/documents.parquet", f"{tmp_path}/prepared_ws",
        f"{tmp_path}/state0.jsonl",
    )
    assert r0.returncode == 0, r0.stderr[-2000:]
    card0 = _card(r0.stdout)
    for k in (
        "input_docs", "removed_quality", "removed_exact_dup",
        "removed_near_dup", "removed_contaminated", "removed_over_quota",
        "kept", "kept_tokens", "token_budget", "tokens_by_source",
        "splits",
    ):
        assert card[k] == card0[k], k
    # BPE fertility > 1 ⇒ more pack tokens than whitespace tokens ⇒ at
    # least as many packs under the same budget
    assert card["n_packs"] >= card0["n_packs"]


def test_pretrain_prep_deterministic(spark, sf_dir, tmp_path):
    """Same input → bit-identical card (the whole pipeline is
    hash-keyed: fingerprints, minhash bands, md5 buckets — no rand())."""
    cards = []
    for i in (1, 2):
        out = f"{tmp_path}/rep{i}"
        r = _run_cli(
            tmp_path, f"{sf_dir}/documents.parquet", out, f"{out}.jsonl"
        )
        assert r.returncode == 0, r.stderr[-2000:]
        card = _card(r.stdout)
        card.pop("stage_wall_sec")
        cards.append(card)
    assert cards[0] == cards[1]


@pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="sf1 corpus not generated (tools/gen_scale_data.py /tmp/sg_sf1 "
    "--docs 50000 --vectors 20000)",
)
def test_pretrain_prep_sf1(tmp_path):
    """The composed DAG at sf1 (50k docs — 10× the bench SF): the run
    must complete, reconcile, and report per-stage wall times (recorded
    in SCALE.md).  This is the memory-pressure/lineage shape no
    per-lane test exercises."""
    out = f"{tmp_path}/prepared_sf1"
    r = _run_cli(
        tmp_path, f"{SF1_DIR}/documents.parquet", out, f"{out}.jsonl"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    card = _card(r.stdout)
    _assert_card_reconciles(card)
    assert card["input_docs"] >= 50_000
    total_wall = sum(card["stage_wall_sec"].values())
    print(f"\npretrain_prep sf1 wall: {total_wall:.1f}s "
          f"stages={card['stage_wall_sec']}")
