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
# oracle side changed since their latest committed driver row.  The ten
# r6-pinned oracle-change lanes all re-earned green rows in
# CORRECTNESS_r06.  Round 7 pins five driver-green lanes whose SPARK
# side changed: three refactored to frame-level helpers for
# jobs.pretrain_prep (plan-identical) and the two md5-LSH lanes
# re-planned onto broadcast plane tables — all five re-gated
# hash-neutral locally; the pin converts that into driver evidence.  The r7-changed lanes
# NOT pinned here (q_token_budget_pack two-phase re-plan,
# q_url_canonicalize scheme guard, q_y4m_decode dimension guard) sit in
# the never-driver-checked block already and get fresh rows anyway.
# Round-7 accounting: 4 pinned + 4 recheck + 37 never-driver-checked
# (34 carried + 3 new, budgeted to window − tail − recheck) = 45 of
# ~50 slots: the tail CLOSES this round — done = CORRECTNESS_r07
# leaves zero never-checked queries.
PINNED: tuple[str, ...] = (
    "q_quality_filter_funnel",  # r7: rules extracted to gopher_rules()
    "q_dsir_weights",  # r7: body extracted to dsir_weights_of()
    "q_contamination_check",  # r7: gate extracted to contamination_hits()
    # r7: md5-plane signatures re-planned literal tree → broadcast
    # plane table + keyed fold (hash-neutral locally, 2.0s → 1.3s).
    # q_ann_recall_oracle is NOT pinned: it already carried its own
    # inline broadcast-plane form (the r4 lesson this re-plan reuses)
    # and its Spark side did not change this round.
    "q_ann_lsh_oracle",
)

RECHECK_QUOTA = 4

# Once the never-driver-checked block shrinks below this, the window is
# mostly re-verification anyway — widen the recheck rotation so each
# round's quota covers more of the registry (r5 verdict item 7).  The
# rotation start already strides with the round number, so a wider
# quota sweeps MORE DISTINCT queries per round, not the same ones.
_RECHECK_QUOTA_WIDE = 6
_FRESH_EXHAUSTED_AT = 10


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


def _recheck_picks(checked: set[str], round_no: int, quota: int) -> list[str]:
    """Deterministic round-robin: rotate ``quota`` previously-checked
    queries back into the window, advancing with the round number."""
    pool = sorted(checked)
    if not pool:
        return []
    start = (round_no * quota) % len(pool)
    return [pool[(start + i) % len(pool)] for i in range(min(quota, len(pool)))]


# Approximate driver window size: used only to stride the already-checked
# rotation so successive rounds' windows cover DISJOINT slices of the
# registry once the never-checked block is exhausted (round 7+), instead
# of re-verifying the same static prefix every round.
_WINDOW_STRIDE = 46


def driver_order(queries: dict) -> dict:
    """Reorder the registry: PINNED, recheck quota, never-driver-checked
    (stable order), then already-checked ROTATED by round so the window's
    tail slots sweep the whole registry across rounds."""
    seen = checked_names()
    next_round = (max((n for n, _ in _round_files()), default=0)) + 1
    pinned = [n for n in PINNED if n in queries]
    n_fresh = sum(1 for n in queries if n not in seen and n not in pinned)
    quota = (
        RECHECK_QUOTA if n_fresh > _FRESH_EXHAUSTED_AT else _RECHECK_QUOTA_WIDE
    )
    recheck = [
        n for n in _recheck_picks(seen, next_round, quota)
        if n in queries and n not in pinned
    ]
    head = set(pinned) | set(recheck)
    fresh = [n for n in queries if n not in seen and n not in head]
    done = [n for n in queries if n in seen and n not in head]
    if done:
        k = (next_round * _WINDOW_STRIDE) % len(done)
        done = done[k:] + done[:k]
    return {n: queries[n] for n in (*pinned, *recheck, *fresh, *done)}
