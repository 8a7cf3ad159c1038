"""One timed extraction run in a fresh JVM (spawned by run_scaling.py).

argv: <cpus> <corpus_path> <n_timed_runs>
Prints one JSON line: {"cpus": N, "walls": [...], "n_docs": N}
Timing excludes session startup and a warm-up pass (JVM/codegen/Arrow).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2]
    n_runs = int(sys.argv[3])

    from bench import build_session
    from freki_spark.pipeline import extract

    spark = build_session(cpus, app=f"freki-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(corpus)
    n_docs = df.count()

    # warm-up (full pass, excluded): python worker daemons, codegen,
    # Arrow buffers and page cache all come up on run 1
    extract(df, salt_threshold=40).write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        extract(df, salt_threshold=40).write.format("noop").mode("overwrite").save()
        walls.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"cpus": cpus, "walls": walls, "n_docs": n_docs}))
    spark.stop()


if __name__ == "__main__":
    main()
