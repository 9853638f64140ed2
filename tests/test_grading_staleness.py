"""Staleness-first grading policy, lint-enforced (round 11).

"Graded at least once" closed in round 10; the standing policy is now
"no entry's last driver grade older than ~4 rounds". This lint makes the
policy self-enforcing: it derives each catalog entry's last-graded round
from the committed CORRECTNESS_r*.json artifacts and fails whenever an
entry OUTSIDE the graded window has gone stale — i.e. the next rotation
is overdue. A brand-new entry (never graded) must sit INSIDE the window
so its first grade happens immediately.
"""

from __future__ import annotations

import glob
import json
import os
import re

from ecommerce_full_etl_process_spark.plans import catalog

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: An entry not in the graded window may be at most this many rounds
#: behind the latest graded round. A 50-slot window over ~156 entries
#: re-grades everything on a ~3.1-round cadence, so perfect rotation
#: yields ≤4-round gaps; 5 gives one round of slack so the lint demands
#: the rotation the round BEFORE an entry would breach the ~4-round
#: policy target, instead of starting that round red.
MAX_STALENESS = 5


def _last_graded() -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", path).group(1))
        latest = max(latest, rnd)
        with open(path) as f:
            for key in json.load(f):
                last[key] = max(last.get(key, 0), rnd)
    return last, latest


def test_window_is_exactly_tier1():
    names = list(catalog.spark_queries())
    assert names[: catalog.GRADED_WINDOW] == catalog.TIER1


def test_never_graded_entries_sit_inside_window():
    last, _ = _last_graded()
    window = set(catalog.TIER1)
    missing = [
        name
        for name in catalog.spark_queries()
        if name not in last and name not in window
    ]
    assert not missing, (
        f"never-driver-graded entries parked outside the graded window "
        f"(they would stay ungraded forever): {missing}"
    )


def test_no_entry_outside_window_is_stale():
    """Every entry the upcoming driver run will NOT grade must have a
    recent-enough last grade. When this fails, rotate the listed entries
    into catalog.TIER1 (demoting entries graded within the last 2
    rounds) — that IS the standing policy."""
    last, latest = _last_graded()
    window = set(catalog.TIER1)
    floor = latest + 1 - MAX_STALENESS  # the upcoming round is latest+1
    overdue = sorted(
        (name, rnd)
        for name, rnd in last.items()
        if name not in window
        and name in catalog.spark_queries()
        and rnd < floor
    )
    assert not overdue, (
        f"rotation overdue — entries outside the graded window last "
        f"graded before r{floor:02d}: {overdue}"
    )
