"""Keep the README's registry count honest (round-4 verdict item 7).

The "NNN registered queries" line in README.md drifted in rounds 3 and 4
because it was hand-maintained. This tool rewrites it from the live
registry; run it before every end-of-round snapshot (and any time the
registry grows). With --check it exits 1 instead of rewriting, so tests
can pin the invariant.

Run from the repo root:  python tools/readme_counts.py [--check]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COUNT_RE = re.compile(r"^\d+ registered queries;", re.MULTILINE)


def main() -> int:
    from amazon_kinesis_data_streams_health_check_spark.plans.registry import all_queries

    n = len(all_queries())
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    m = COUNT_RE.search(text)
    if not m:
        print("readme_counts: no 'NNN registered queries;' line found in README.md")
        return 1
    want = f"{n} registered queries;"
    if m.group(0) == want:
        print(f"readme_counts: README already says {n} — OK")
        return 0
    if "--check" in sys.argv:
        print(f"readme_counts: README says {m.group(0)!r} but registry has {n} — run tools/readme_counts.py")
        return 1
    with open(path, "w") as f:
        f.write(COUNT_RE.sub(want, text, count=1))
    print(f"readme_counts: README updated {m.group(0)!r} -> {want!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
