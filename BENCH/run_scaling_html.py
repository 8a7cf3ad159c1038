"""N -> 4N scaling evidence for the HTML (boilerplate-strip) half of
the pipeline — same protocol as run_scaling.py (taskset-pinned levels,
fresh JVM per level, warm-up excluded, >=3 timed runs, min-of-walls
capability figures), on the deterministic HTML page corpus.

The HTML path is the same narrow zero-shuffle map as the XML path
(kernel dispatch on kind='html'), so this run evidences that the
scaling property holds for both dialects of the north rule.

Writes BENCH/scaling_html.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# ~96k pages: 2-core wall ~25-30 s.  Shorter than the XML protocol's
# ~90 s guidance (fixed costs depress the ratio by ~0.02 at ~30 s,
# see run_scaling.py) — the measured 0.856 clears the 0.8 bar with
# margin even under that penalty; scale FREKI_BENCH_HTML_DOCS up for
# a tighter figure
os.environ.setdefault("FREKI_BENCH_HTML_DOCS", "96000")
N_RUNS = int(os.environ.get("FREKI_SCALING_RUNS", "3"))
LEVELS = (2, 8, 32)


def ensure_corpus() -> str:
    from bench import HTML_CORPUS, build_session, ensure_html_corpus

    if not os.path.exists(os.path.join(HTML_CORPUS, "_SUCCESS")):
        spark = build_session(32, app="freki-html-corpus-gen")
        spark.sparkContext.setLogLevel("ERROR")
        ensure_html_corpus(spark)
        spark.stop()
    return HTML_CORPUS


def main() -> None:
    corpus = ensure_corpus()
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [
                "taskset",
                "-c",
                f"0-{cpus - 1}",
                sys.executable,
                os.path.join(HERE, "_extract_run.py"),
                str(cpus),
                corpus,
                str(N_RUNS),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"level {cpus} failed (rc={out.returncode})")
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            sys.stderr.write(out.stderr)
            raise SystemExit(f"level {cpus}: no JSON line in output")
        line = lines[-1]
        results[cpus] = json.loads(line)
        print(line)

    n_docs = results[LEVELS[0]]["n_docs"]
    med = {c: statistics.median(results[c]["walls"]) for c in LEVELS}
    best = {c: min(results[c]["walls"]) for c in LEVELS}
    thr = {c: n_docs / best[c] for c in LEVELS}
    summary = {
        "corpus": "html",
        "n_docs": n_docs,
        "median_wall_s": {str(c): round(med[c], 3) for c in LEVELS},
        "best_wall_s": {str(c): round(best[c], 3) for c in LEVELS},
        "docs_per_sec": {str(c): round(thr[c], 1) for c in LEVELS},
        "all_walls": {str(c): results[c]["walls"] for c in LEVELS},
        "scaling_efficiency_2_to_8": round((thr[8] / thr[2]) / 4, 3),
        "scaling_efficiency_8_to_32": round((thr[32] / thr[8]) / 4, 3),
        "accept_threshold": 0.8,
        "pass": (thr[8] / thr[2]) / 4 >= 0.8,
    }
    with open(os.path.join(HERE, "scaling_html.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
