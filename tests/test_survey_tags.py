"""SURVEY §2.9 status-tag drift gate (r9 verdict 'what's wrong' #1:
the same annotation pattern went stale in r8 and nearly in r9).

A row that says "driver row pending" must describe a lane with NO
committed driver evidence yet; the moment a CORRECTNESS_r{N}.json
carries the lane, this test fails with the exact rows to flip — so the
flip lands in the first commit after the window, not a round later."""

import os
import re

from glue_etl_nyc_yellow_taxi_analysis_spark.coverage import evidence_age

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROW = re.compile(r"^\| `(q_\w+)` \|.*\|\s*([^|]*)\|\s*$")


def test_pending_tags_match_driver_evidence():
    age = evidence_age()
    stale = []
    for line in open(os.path.join(REPO, "SURVEY.md")):
        m = _ROW.match(line)
        if not m:
            continue
        lane, status = m.group(1), m.group(2)
        if "pending" in status and lane in age:
            stale.append((lane, f"has a driver row since r{age[lane]}"))
    assert not stale, (
        "SURVEY §2.9 rows still say 'driver row pending' but the driver "
        f"evidence exists — flip these now: {stale}"
    )
