"""Invariants of the driver-window coverage rotation (coverage.py).

The external gate checks only the first ~50 registry entries per round,
so the rotation IS the mechanism by which the whole inventory earns
driver evidence — a silent ordering bug would freeze coverage forever.
Pure-python tests against the real registry + committed CORRECTNESS
files.
"""

from glue_etl_nyc_yellow_taxi_analysis_spark.coverage import (
    PINNED,
    RECHECK_QUOTA,
    checked_names,
    driver_order,
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
    pinned = [n for n in PINNED if n in QUERIES]
    # 1. pinned first, in declaration order
    assert ordered[: len(pinned)] == pinned
    # 2. then the recheck quota: previously-checked, not pinned
    recheck = ordered[len(pinned) : len(pinned) + RECHECK_QUOTA]
    assert all(n in seen and n not in pinned for n in recheck)
    # 3. never-checked block precedes the already-checked tail
    rest = ordered[len(pinned) + RECHECK_QUOTA :]
    fresh_flags = [n not in seen for n in rest]
    # once we hit the checked tail, no fresh query may follow
    if False in fresh_flags and True in fresh_flags:
        assert fresh_flags.index(False) > max(
            i for i, f in enumerate(fresh_flags) if f
        )


def test_pinned_leaves_room_for_recheck_and_fresh():
    """ADVICE r3: PINNED must stay ≤ window − RECHECK_QUOTA so the
    recheck rotation is never starved and the window keeps consuming
    never-checked queries."""
    assert len(PINNED) <= 50 - RECHECK_QUOTA
    assert all(p in QUERIES for p in PINNED)


def test_recheck_quota_widens_when_fresh_block_exhausted():
    """r5 verdict item 7: once (almost) everything has a driver row, the
    recheck rotation must widen from 4 to 6 so round-7+ windows sweep
    more of the registry instead of re-verifying a static prefix."""
    from glue_etl_nyc_yellow_taxi_analysis_spark.coverage import (
        _RECHECK_QUOTA_WIDE,
    )

    seen = checked_names()
    pinned = set(PINNED)
    exhausted = {
        n: QUERIES[n] for n in QUERIES if n in seen or n in pinned
    }
    ordered = list(driver_order(exhausted))
    n_pinned = len([n for n in PINNED if n in exhausted])
    recheck = ordered[n_pinned : n_pinned + _RECHECK_QUOTA_WIDE]
    assert len(recheck) == _RECHECK_QUOTA_WIDE
    assert all(n in seen and n not in pinned for n in recheck)
    # today's registry still has >10 fresh lanes → quota stays narrow
    fresh_now = [n for n in QUERIES if n not in seen and n not in pinned]
    if len(fresh_now) > 10:
        ordered_now = list(driver_order(QUERIES))
        tail = ordered_now[len([n for n in PINNED if n in QUERIES]) :]
        # the 5th window slot after pinned+4 rechecks is a FRESH query
        assert tail[RECHECK_QUOTA] not in seen
