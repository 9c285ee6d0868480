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

# Must re-earn a driver row this round: only queries whose Spark or
# oracle side changed since their latest committed driver row.
# Round 12 replanned far more lanes than the 10-pin cap (SemDeDup's
# applyInPandas prune kernel, the auto-fused media stages across ~15
# codec lanes, seven multi-scan checkpoint rollups, the REP hosts
# materialization, the graph-edge checkpoints, the PQ write sizing),
# so the pins take ONE representative per changed MECHANISM, weighted
# by semantic risk:
#   * the SemDeDup Arrow kernel (bit-exact float replay — the round's
#     riskiest change) gets all three consumers;
#   * q_y4m_chroma_decode is the deepest media-fusion transform
#     (3 filtered branches -> 1 Arrow pass + vectorized reductions);
#   * q_kn_bigram_ppl is the most aggressive multi-scan rollup (5->1
#     corpus passes);
#   * q_pq_index_persist (content-sized write + read-back) and
#     q_ann_pq_oracle (r11 expression rewrite + r12 try_element_at)
#     cover the PQ family;
#   * q_stream_ann_enrich (code-table sizing + stream machinery) and
#     q_quality_auc (r11 rewrite, never driver-sampled) carry the r11
#     debt (verdict item 4);
#   * q_crawl_schedule covers the REP hosts materialization.
# Left out deliberately: q_ann_ivfpq/q_pq_recall/q_pq_rerank (same PQ
# machinery as the two pinned), q_lsa_topic (r11 change was a
# value-identical localCheckpoint), the rollup/char-staging/graph
# lanes (integer-identical derivations, collect-compared); all are
# oracle-proven locally and q_hybrid_retrieval/q_rag_context_pack
# land in the window's natural stale tail anyway.
PINNED: tuple[str, ...] = (
    "q_semdedup",
    "q_semdedup_ivf",
    "q_semdedup_multirep",
    "q_y4m_chroma_decode",
    "q_kn_bigram_ppl",
    "q_pq_index_persist",
    "q_ann_pq_oracle",
    "q_stream_ann_enrich",
    "q_quality_auc",
    "q_crawl_schedule",
)

# Rounds 1-2 predate the r3 bit-exact hash canonicalization, so a lane
# whose LATEST driver row is r1/r2 has only lax-era external evidence.
# Until that backlog is empty, those lanes outrank even never-checked
# lanes for window slots: a brand-new lane at least has the local
# strict gate (tools/check_oracle.py + pytest) from the round it was
# born, while a pre-r3 row was never externally checked bit-exact at
# all.  Round 9 has exactly 50 such lanes (18 r1 + 32 r2) — one full
# driver window; new lanes added this round earn their driver row next
# round, when this constant's set is empty and ordering degrades to
# the usual fresh-then-oldest rotation.
STRICT_GATE_ROUND = 3


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


def evidence_age() -> dict[str, int]:
    """Latest committed driver round per query name.  Queries whose most
    recent driver row is oldest are the ones a silent regression could
    hide in longest — they re-enter the window first."""
    latest: dict[str, int] = {}
    for rnd, p in _round_files():
        try:
            with open(p) as f:
                for name in json.load(f):
                    latest[name] = rnd  # files sorted ascending by round
        except (OSError, json.JSONDecodeError):
            continue
    return latest


def driver_order(queries: dict) -> dict:
    """Reorder the registry: PINNED (changed this round), then lanes
    whose latest driver row predates the strict bit-exact gate
    (oldest-first — see STRICT_GATE_ROUND), then never-driver-checked
    lanes (stable registry order), then everything else ordered
    oldest-evidence-first.

    With the never-checked tail closed (round 7), every window slot
    after the pins re-verifies the stalest committed evidence — ~50
    lanes per round, so the whole 311-query registry re-earns a fresh
    driver row about every 6 rounds.  Ordering by (latest_round,
    registry order) is self-balancing: lanes re-checked this round drop
    to the back automatically in the next round's ordering."""
    age = evidence_age()
    pinned = [n for n in PINNED if n in queries]
    head = set(pinned)
    order = list(queries)
    lax = sorted(
        (
            n
            for n in queries
            if n in age and age[n] < STRICT_GATE_ROUND and n not in head
        ),
        key=lambda n: (age[n], order.index(n)),
    )
    head.update(lax)
    fresh = [n for n in queries if n not in age and n not in head]
    done = sorted(
        (n for n in queries if n in age and n not in head),
        key=lambda n: (age[n], order.index(n)),
    )
    return {n: queries[n] for n in (*pinned, *lax, *fresh, *done)}
