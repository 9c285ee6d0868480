"""Invariants of the driver-window coverage rotation (coverage.py).

The external gate checks only the first ~50 registry entries per round,
so the rotation IS the mechanism by which the whole inventory earns
driver evidence — a silent ordering bug would freeze coverage forever.
Pure-python tests against the real registry + committed CORRECTNESS
files.

Round 8 redesign: the never-driver-checked tail closed in round 7, so
the window's value is now RE-verification — the order after the pins is
oldest-evidence-first (latest committed driver round ascending), which
is self-balancing: lanes re-checked this round sort to the back next
round.

Round 9 refinement: lanes whose latest driver row predates the r3
bit-exact hash gate (STRICT_GATE_ROUND) outrank even never-checked
lanes until that backlog is empty — lax-era evidence is weaker than a
new lane's local strict gate.
"""

from glue_etl_nyc_yellow_taxi_analysis_spark.coverage import (
    PINNED,
    STRICT_GATE_ROUND,
    checked_names,
    driver_order,
    evidence_age,
)
from glue_etl_nyc_yellow_taxi_analysis_spark.queries import QUERIES


def test_driver_order_retains_every_query():
    ordered = driver_order(QUERIES)
    assert set(ordered) == set(QUERIES)
    assert list(ordered.values())  # callables preserved
    # deterministic: same inputs → same order
    assert list(ordered) == list(driver_order(QUERIES))


def test_driver_order_sections():
    ordered = list(driver_order(QUERIES))
    seen = checked_names()
    age = evidence_age()
    pinned = [n for n in PINNED if n in QUERIES]
    # 1. pinned first, in declaration order
    assert ordered[: len(pinned)] == pinned
    rest = ordered[len(pinned):]
    # 2. lax-era lanes (latest row predates the strict hash gate) come
    #    next, oldest-first, BEFORE never-checked lanes
    lax = [n for n in rest if n in age and age[n] < STRICT_GATE_ROUND]
    assert rest[: len(lax)] == lax
    lax_ages = [age[n] for n in lax]
    assert lax_ages == sorted(lax_ages)
    # 3. never-checked (new) lanes precede every strict-era checked lane
    after_lax = rest[len(lax):]
    fresh_flags = [n not in seen for n in after_lax]
    if False in fresh_flags and True in fresh_flags:
        assert fresh_flags.index(False) > max(
            i for i, f in enumerate(fresh_flags) if f
        )
    # 4. the strict-era checked tail is ordered oldest-evidence-first
    tail_ages = [age[n] for n in after_lax if n in age]
    assert tail_ages == sorted(tail_ages)


def test_window_consumes_stalest_evidence():
    """The ~50-slot window after pins+fresh must hold the registry's
    STALEST lanes: no lane outside the window may have strictly older
    evidence than a checked lane inside it."""
    ordered = list(driver_order(QUERIES))
    age = evidence_age()
    window, beyond = ordered[:50], ordered[50:]
    # pins re-earn evidence because they CHANGED, not because they're
    # stale — exclude them from the staleness comparison
    win_ages = [age[n] for n in window if n in age and n not in PINNED]
    beyond_ages = [age[n] for n in beyond if n in age]
    if win_ages and beyond_ages:
        assert max(win_ages) <= min(beyond_ages)


def test_pinned_small_and_declared():
    """Pins must stay a small prefix (≤10) so the window's bulk keeps
    consuming stale evidence, and every pin must exist in the registry."""
    assert len(PINNED) <= 10
    assert all(p in QUERIES for p in PINNED)


def test_recheck_self_balancing():
    """Simulate a committed round: giving the current window fresh rows
    must rotate a DIFFERENT (older-evidence) slice to the front next
    time — re-checked lanes fall to the back."""
    ordered = list(driver_order(QUERIES))
    age = dict(evidence_age())
    next_round = max(age.values(), default=0) + 1
    for n in ordered[:50]:
        age[n] = next_round
    pinned = set(PINNED)
    resorted = sorted(
        (n for n in QUERIES if n in age and n not in pinned),
        key=lambda n: (age[n], list(QUERIES).index(n)),
    )
    survivors = [n for n in ordered[:50] if n in resorted[:50]]
    # at most the pins' worth of overlap: the window genuinely sweeps
    assert len(survivors) <= len(PINNED) + 5
