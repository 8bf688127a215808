"""Round-start rotation check — run FIRST THING each round.

The pytest rotation guard (tests/test_registry.py::
test_rotation_slots_are_first_ever_driver_rows) excuses slots whose only
green row is the newest CORRECTNESS artifact, because that is the designed
end-of-round state after the driver drops the round's results. This tool
applies the SAME cumulative-coverage rule with NO carve-out: at round
start, every ROTATION slot must be absent from the full driver history.
Exit 1 with the offending names otherwise.

Run from the repo root:  python tools/round_start_check.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coverage_ledger import driver_history, first_green  # noqa: E402


def main() -> int:
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import ROTATION, all_queries

    qs = all_queries()
    fg = first_green(driver_history())
    backlog = sorted(n for n in qs if n not in fg and n not in ROTATION)
    reburned = [n for n in ROTATION if n in fg]
    if reburned and backlog:
        print(
            f"ROUND-START FAIL: rotation slots already driver-green: {reburned}\n"
            f"{len(backlog)} never-checked queries remain — rotate before building."
        )
        return 1
    print(
        f"round-start OK: {len(ROTATION)} rotation slots all first-ever; "
        f"{len(backlog)} never-checked queries remain in the backlog."
    )
    # Regenerate COVERAGE.md in the same step (round-5 verdict: the ledger
    # goes stale every round because the driver drops CORRECTNESS after the
    # snapshot — folding the regen here makes rotation and ledger one
    # action).
    import coverage_ledger

    coverage_ledger.main()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
