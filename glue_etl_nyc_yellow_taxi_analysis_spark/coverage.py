"""Driver-window coverage rotation.

The external correctness gate checks the FIRST ~50 entries of the declared
query registry each round, so with ~200 declared queries a static order
would leave most of the inventory without hard driver-side evidence
forever.  This module reads which queries already have a driver row (the
committed CORRECTNESS_r{N}.json files) and reorders the registry so that:

1. ``PINNED`` queries come first — fixes that need fresh driver evidence
   this round.
2. A small ``RECHECK_QUOTA`` of previously-green queries rotates back in
   (round-robin keyed on the round number) so a regression in an
   already-checked query is eventually re-detected, not invisible forever.
3. Queries never driver-checked in any past round come next (stable
   registry order), so the window keeps consuming new evidence each round.
4. Remaining previously-checked queries go last — their rows exist in
   committed CORRECTNESS_r{N}.json files.

Every query remains declared and locally gated (tools/check_oracle.py +
pytest) regardless of position.
"""

from __future__ import annotations

import glob
import json
import os
import re

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Must re-earn a driver row this round: the r2 hash-fail/err fixes (ppm
# integer ratios, BIGINT-cast oracle sums, hashable multimodal features)
# plus the new oracle-bearing queries added in r3.
PINNED: tuple[str, ...] = (
    "q_contamination_check",
    "q_boilerplate_ratio",
    "q_dataset_mixture",
    "q_sequence_packing",
    "q_stream_static_join",
    "q_multimodal_features",
    "q_minhash_dedup_oracle",  # oracle filter-order fix (raw-jaccard gate)
    "q_embedding_quantize",  # mse -> mse_e12 integer lane (schema change)
    "q_taxi_star_build",  # total_amount decimal -> double (schema change)
    "q_taxi_star_deterministic",  # flagship Job-1 pipeline, now hash-checked
    "q_ann_lsh_oracle",  # seed-replay LSH ANN twin
    "q_multimodal_resize",  # r3: resize plumbing, SQL-replayed byte-exact
    "q_dedup_cross_source",  # r3: cross-source duplication matrix
    "q_doc_logprob",  # r3: unigram-LM quality score
    "q_semdedup",  # r3: SemDeDup cluster-bounded semantic dedup
    "q_line_dedup",  # r3: C4-style segment removal + reconstruction
    "q_bpe_merge_train",  # r3: iterative BPE merge loop, chained-CTE oracle
    "q_bpe_apply",  # r3: tokenizer apply — per-source compression accounting
    "q_quality_classifier",  # r3: integer-lane linear quality model
    "q_kanonymity",  # r3: k-anonymity audit + generalization ladder
    "q_stream_quality_filter",  # r3: curation inside Structured Streaming
    "q_train_split",  # r3: deterministic train/val/test carve + audit
    "q_containment_dedup",  # r3: directed quote/excerpt containment pairs
    "q_pca_power",  # r3: exact-lane power iteration, chained-CTE oracle
    "q_compaction_plan",  # r3: small-file compaction planning
    "q_quality_calibration",  # r3: logit-band calibration vs gold labels
    "q_doc_ppl_bigram",  # r3: bigram-LM doc scoring, decimal-summed logs
    "q_global_shuffle",  # r3: deterministic shard shuffle + order checksum
    "q_dedup_recall",  # r3: LSH recall/precision vs exact ground truth
    "q_embedding_dim_stats",  # r3: per-dim embedding health profile
    "q_pmi_bigrams",  # r3: PMI association, log2-of-integers lane
    "q_salt_plan",  # r3: adaptive skew-salting plan
    "q_dup_graph_degree",  # r3: near-dup graph degree histogram
    "q_zipf_fit",  # r3: Zipf-law regression, decimal-routed sums
    "q_corpus_drift_js",  # r3: Jensen-Shannon corpus drift, integer logs
    "q_dedup_incremental",  # r3: new-batch-vs-base asymmetric LSH probe
    "q_sql_ctas",  # S5 catalog-table scan — the last §2 row without a
    # driver row (VERDICT r2 item 2)
    "q_substr_dedup",  # r3: ExactSubstr repeated-span removal + rebuild
    "q_tokenizer_oov",  # r3: per-source OOV rate vs corpus top-V vocab
    "q_heaps_fit",  # r3: Heaps'-law vocabulary-growth regression
    "q_ann_recall_oracle",  # r3: ANN recall dial, both sides oracle-exact
    "q_span_mask_plan",  # r3: deterministic T5 span-corruption plan
    "q_dataset_card",  # r3: one-row corpus release card
    "q_audio_energy_windows",  # r3: audio-leg energy windowing, numpy lane
    "q_image_blockhash_neardup",  # r3: image-leg blockhash near-dup pairs
    "q_video_scene_cut",  # r3: video-leg shot segmentation, pure JVM map
    "q_langid_confusion",  # r3: lang-ID confusion matrix eval harness
    "q_embedding_outliers",  # r3: vector-norm z-band health profile
    "q_stream_dedup_incremental",  # r3: streaming admission-control dedup
    "q_dedup_index_persist",  # r3: bucketed band index, shuffle-free probe
    "q_length_moments",  # r3: per-source skew/kurtosis, exact power sums
    "q_dedup_savings",  # r3: per-band dedup savings report
)

RECHECK_QUOTA = 4


def _round_files() -> list[tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)

def checked_names() -> set[str]:
    names: set[str] = set()
    for _, p in _round_files():
        try:
            with open(p) as f:
                names.update(json.load(f).keys())
        except (OSError, json.JSONDecodeError):
            continue
    return names


def _recheck_picks(checked: set[str], round_no: int) -> list[str]:
    """Deterministic round-robin: rotate RECHECK_QUOTA previously-checked
    queries back into the window, advancing with the round number."""
    pool = sorted(checked)
    if not pool:
        return []
    start = (round_no * RECHECK_QUOTA) % len(pool)
    return [pool[(start + i) % len(pool)] for i in range(min(RECHECK_QUOTA, len(pool)))]


def driver_order(queries: dict) -> dict:
    """Reorder the registry: PINNED, recheck quota, never-driver-checked
    (stable order), then already-checked."""
    seen = checked_names()
    next_round = (max((n for n, _ in _round_files()), default=0)) + 1
    pinned = [n for n in PINNED if n in queries]
    recheck = [
        n for n in _recheck_picks(seen, next_round)
        if n in queries and n not in pinned
    ]
    head = set(pinned) | set(recheck)
    fresh = [n for n in queries if n not in seen and n not in head]
    done = [n for n in queries if n in seen and n not in head]
    return {n: queries[n] for n in (*pinned, *recheck, *fresh, *done)}
