"""README capability numbers must match the live registry (r5 verdict
item 8: the matrix drifted twice; now drift fails the suite).

The counts are asserted, not regenerated — a failing run prints the
correct values to paste into README.md."""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_counts_match_registry():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    declared, oracled = len(entry.queries()), len(entry.oracle_sql())
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(
        r"\*\*(\d+) queries, (\d+) oracle-checked\*\*", readme
    )
    assert m, "README.md lost its inventory-count line"
    assert (int(m.group(1)), int(m.group(2))) == (declared, oracled), (
        f"README says {m.group(0)}; registry has {declared} queries, "
        f"{oracled} oracle-checked — update README.md"
    )


def test_readme_test_count_not_stale():
    """The advertised pytest count is PINNED exactly, like the
    capability counts (r9 verdict item 8: the 15% tolerance let the
    README trail the live suite by 96 tests) — a failing run prints
    the number to paste."""
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    m = re.search(r"(\d+) tests collected", collected.stdout)
    assert m, collected.stdout[-500:]
    actual = int(m.group(1))
    readme = open(os.path.join(REPO, "README.md")).read()
    adv = re.search(r"# (\d+) unit/property/plan-contract/e2e tests", readme)
    assert adv, "README.md lost its test-count line"
    advertised = int(adv.group(1))
    assert advertised == actual, (
        f"README advertises {advertised} tests, suite collects {actual} "
        f"— update the README.md count"
    )
