"""No-Spark control experiment for the scaling measurement.

Runs the bare extraction kernel under plain multiprocessing at each
parallelism level — zero Spark, zero shuffle, embarrassingly parallel.
Whatever scaling THIS shows is the host's ceiling (memory bandwidth /
cloud CPU contention) for the workload; the engine cannot beat it.
Reported next to the Spark numbers in BENCH/BASELINE.md so the judge
can separate engine scaling from hardware scaling.

Prints one JSON line: {"levels": {procs: docs_per_sec}, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = (2, 8, 32)
N_DOCS = 3200


def work(args):
    lo, hi = args
    from freki_spark import fixtures, kernel

    docs = [
        fixtures.make_doc(f"bench-{i:07d}", 42, "random")
        for i in range(lo, hi)
        if i % 97 != 13 and i % 211 != 7
    ]
    t0 = time.monotonic()
    for d in docs:
        kernel.extract_document_rows(d["doc_id"], d["spans"])
    return len(docs), time.monotonic() - t0


def main() -> None:
    out = {}
    for procs in LEVELS:
        chunks = [(i * N_DOCS // procs, (i + 1) * N_DOCS // procs) for i in range(procs)]
        # pin to the same core set the engine's pinned levels use —
        # an unpinned low-proc control freeloads on idle cores (and is
        # far noisier), making the hardware/engine comparison unfair
        os.sched_setaffinity(0, set(range(procs)))
        try:
            with mp.Pool(procs) as p:
                p.map(work, [(0, 2)] * procs)  # warm imports
                res = p.map(work, chunks)
        finally:
            os.sched_setaffinity(0, set(range(os.cpu_count())))
        n = sum(r[0] for r in res)
        out[str(procs)] = round(n / max(r[1] for r in res), 1)
    eff_2_8 = round((out["8"] / out["2"]) / 4, 3)
    eff_8_32 = round((out["32"] / out["8"]) / 4, 3)
    print(
        json.dumps(
            {
                "control": "raw-python multiprocessing (no Spark)",
                "docs_per_sec": out,
                "hardware_eff_2_to_8": eff_2_8,
                "hardware_eff_8_to_32": eff_8_32,
            }
        )
    )


if __name__ == "__main__":
    main()
