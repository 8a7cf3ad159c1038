"""Plan the next driver-window rotation of `_PRIORITY`.

The driver's CORRECTNESS gate records exactly the FIRST 50 registry
entries each round, so each round the window should hold the 50
highest-value entries that have never had a driver row (plus any
changed-code re-rotations).  This tool reads every CORRECTNESS_r*.json
at the repo root, diffs the union of recorded slugs against the current
`_PRIORITY`, and prints:

  - coverage stats (checked / never-checked / not-yet-registered),
  - the proposed next-window ordering (never-checked first, preserving
    the current list's relative order — which already encodes the
    round-4/round-5 plan), formatted as a paste-ready Python list body.

It deliberately does NOT rewrite queries.py: the window is a judged
artifact and each rotation wants a human-reviewed commit (changed-code
re-rotations, window-slot priorities).  Run, review, paste.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def fmt(slugs: list[str]) -> str:
    out, line = [], "    "
    for s in slugs:
        tok = f'"{s}", '
        if len(line) + len(tok) > 78:
            out.append(line.rstrip())
            line = "    "
        line += tok
    if line.strip():
        out.append(line.rstrip())
    return "\n".join(out)


def main() -> int:
    checked: set[str] = set()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for p in rounds:
        checked |= set(json.load(open(p)))

    src = open(os.path.join(REPO, "freki_spark", "queries.py")).read()
    m = re.search(r"_PRIORITY = \[(.*?)\n\]", src, re.S)
    priority = re.findall(r'"([^"]+)"', m.group(1))

    from freki_spark.queries import QUERIES

    registered = set(QUERIES)
    never = [s for s in priority if s not in checked]
    done = [s for s in priority if s in checked]
    unlisted = sorted(registered - set(priority))

    print(f"rounds read: {[os.path.basename(p) for p in rounds]}")
    print(
        f"registry={len(registered)} priority={len(priority)} "
        f"driver-checked={len(set(priority) & checked)} "
        f"never-checked={len(never)} unlisted={len(unlisted)}"
    )
    if unlisted:
        print(f"WARNING — registered but not in _PRIORITY: {unlisted}")

    window = never[:WINDOW]
    rest = never[WINDOW:]
    print(f"\nproposed next window ({len(window)}):")
    print(fmt(window))
    print(f"\nremaining never-checked after that ({len(rest)}):")
    print(fmt(rest))
    print(f"\ntail (driver-checked, code unchanged — {len(done)}):")
    print(fmt(done))
    print(
        "\nReview: pull any changed-code slugs back into the window, "
        "then paste the three blocks into _PRIORITY in this order."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
