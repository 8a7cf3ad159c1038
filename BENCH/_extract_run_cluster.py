"""One timed extraction run against a STANDALONE cluster (separate
executor JVMs) — the multi-executor evidence VERDICT r2 item 8 asked
for: unlike local[N], every executor here is its own JVM with its own
python workers and Arrow streams, and exchanges cross process
boundaries, so the N -> 4N ratio measures the real multi-executor
dataflow rather than a single shared JVM feed.

Run via spark-submit:
  spark-submit --master spark://127.0.0.1:7077 \
    --total-executor-cores <N> --executor-cores 2 \
    --executor-memory 6g --py-files freki_spark.zip \
    BENCH/_extract_run_cluster.py <N> <corpus_path> <n_timed_runs>

Prints one JSON line: {"cpus": N, "walls": [...], "n_docs": N}.
Timing excludes session startup and a warm-up pass.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2]
    n_runs = int(sys.argv[3])

    from pyspark.sql import SparkSession

    from freki_spark.pipeline import extract

    # same dataflow-relevant configs as bench.build_session (shuffle
    # partitions / task waves scaled with cores, Arrow batch, the
    # mega-doc reader-batch cap); master/executor topology comes from
    # the spark-submit flags
    spark = (
        SparkSession.builder.appName(f"freki-cluster-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.files.minPartitionNum", str(4 * cpus))
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(corpus)
    n_docs = df.count()

    extract(df, salt_threshold=40).write.format("noop").mode("overwrite").save()

    walls = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        extract(df, salt_threshold=40).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"cpus": cpus, "walls": walls, "n_docs": n_docs}))
    spark.stop()


if __name__ == "__main__":
    main()
