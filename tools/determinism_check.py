"""Determinism across parallelism (SURVEY.md §5.2 item 6): run the
identical extraction job at two parallelism levels / shuffle widths in
fresh JVMs, then prove the outputs byte-identical with a DuckDB
anti-diff over the unnested spans (both directions must be 0).

This is the correctness side of the N-vs-4N scaling claim: more
executors must change throughput, never output.

Usage: python tools/determinism_check.py  [n_docs]   (default 2000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RUN = r"""
import sys, os
sys.path.insert(0, {repo!r})
from bench import build_session, ensure_corpus
from freki_spark.pipeline import extract

cpus = int(sys.argv[1]); out = sys.argv[2]; n = int(sys.argv[3])
spark = build_session(cpus, app=f"determinism-{{cpus}}")
spark.sparkContext.setLogLevel("ERROR")
# deterministic subset: limit() picks whatever split order the scan
# produced (different at different parallelism) — filter by doc_id
df = spark.read.parquet(ensure_corpus(spark)).filter(
    f"doc_id < 'bench-{{n:07d}}'"
)
extract(df, salt_threshold=40).write.mode("overwrite").parquet(out)
spark.stop()
"""


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    tmp = tempfile.mkdtemp(prefix="freki-det-")
    outs = {}
    for cpus in (4, 16):
        out = os.path.join(tmp, f"out_{cpus}")
        subprocess.run(
            [sys.executable, "-c", _RUN.format(repo=REPO), str(cpus), out, str(n_docs)],
            check=True,
            cwd=REPO,
        )
        outs[cpus] = out

    import duckdb

    con = duckdb.connect()
    q = (
        "SELECT doc_id, s.kind, s.text, s.media_ref, s.\"offset\", error "
        "FROM (SELECT doc_id, error, unnest(spans) AS s "
        "      FROM read_parquet('{p}/*.parquet'))"
    )
    a, b = (q.format(p=outs[4]), q.format(p=outs[16]))
    # EXCEPT ALL: set-EXCEPT would hide multiplicity differences
    d1 = con.execute(f"SELECT count(*) FROM ({a} EXCEPT ALL {b})").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM ({b} EXCEPT ALL {a})").fetchone()[0]
    n1 = con.execute(f"SELECT count(*) FROM ({a})").fetchone()[0]
    n2 = con.execute(f"SELECT count(*) FROM ({b})").fetchone()[0]
    ok = d1 == 0 and d2 == 0 and n1 == n2 and n1 > 0
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "spans_4": n1,
                "spans_16": n2,
                "diff_4_minus_16": d1,
                "diff_16_minus_4": d2,
                "identical": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
