"""Per-partition checkpoint / lineage / resume (P12, north rule).

The checkpoint unit is a *batch*: a deterministic hash-bucket of
doc_ids (``pmod(xxhash64(doc_id), n_batches)``) — locally a parquet
partition directory, in production an Iceberg partition whose append
commit is the atomic boundary.  A batch is committed iff its lineage
row says so; data writes happen *before* the lineage append, so a
crash mid-batch leaves an uncommitted (and overwritable) partition.

Resume = two guards, cheapest first:

1. partition prune: committed batch ids are skipped outright
   (deterministic assignment — no data read needed);
2. ``input.join(done_docs, 'doc_id', 'left_anti')`` against the
   outputs of COMMITTED batches only — uncommitted batch dirs may hold
   partial files from a killed run, and trusting them would both skip
   their docs and destroy the partial data on the re-run's overwrite.

``n_batches`` is recorded in lineage and pinned: the batch dirs are
keyed by ``pmod(hash, n_batches)``, so resuming with a different value
would overwrite committed dirs with differently-bucketed data — it is
an explicit error instead.

Lineage schema follows FIXTURES.md §5.
"""

from __future__ import annotations

import datetime as _dt

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import spec
from .pipeline import extract, split_quarantine

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("batch_id", T.IntegerType()),
        T.StructField("n_batches", T.IntegerType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("doc_id_min", T.StringType()),
        T.StructField("doc_id_max", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def committed_batches(spark: SparkSession, out_dir: str) -> set[int]:
    if not _exists(spark, f"{out_dir}/lineage"):
        return set()
    rows = (
        spark.read.parquet(f"{out_dir}/lineage")
        .filter(F.col("status") == "committed")
        .select("batch_id")
        .distinct()
        .collect()
    )
    return {r.batch_id for r in rows}


def lineage_n_batches(spark: SparkSession, out_dir: str) -> set[int]:
    """Distinct n_batches values recorded in the lineage table."""
    if not _exists(spark, f"{out_dir}/lineage"):
        return set()
    lin = spark.read.parquet(f"{out_dir}/lineage")
    if "n_batches" not in lin.columns:  # pre-field outputs
        return set()
    rows = lin.select("n_batches").distinct().collect()
    return {r.n_batches for r in rows if r.n_batches is not None}


def run_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    run_id: str = "run-0",
    n_batches: int = 8,
    max_batches: int | None = None,
    salt_threshold: int = spec.SALT_SPAN_THRESHOLD,
    mode: str = "map",
) -> dict:
    """Run (or resume) checkpointed extraction.  Returns a summary dict.

    max_batches: stop after N batches this invocation (used by the
    resume tests to simulate a killed run; production leaves it None).
    """
    prior_nb = lineage_n_batches(spark, out_dir)
    if prior_nb and prior_nb != {n_batches}:
        # the batch dirs are keyed by pmod(hash, n_batches): a different
        # n_batches remaps doc→batch and the re-run would overwrite
        # committed dirs with differently-bucketed data — refuse loudly
        raise ValueError(
            f"output {out_dir} was written with n_batches={sorted(prior_nb)}; "
            f"resume with the same value (got {n_batches})"
        )
    done = committed_batches(spark, out_dir)
    batched = input_df.withColumn(
        "batch_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)).cast("int")
    )
    if done:
        # the batch filter IS the exactly-once guard: batch_id is a
        # pure function of doc_id (pmod(xxhash64, n)) and n_batches is
        # pinned, so every doc in a committed batch is excluded here —
        # a doc-level anti-join against committed doc_ids can never
        # remove anything more and would re-scan all committed output
        # on every resume (prohibitive at 10^12 docs).  Corollary: a
        # run assumes a static input snapshot; rows ADDED to the input
        # after a batch committed would land in already-done batches
        # and be skipped — ingest new docs with a new run_id/output
        # (or Iceberg snapshot), never by mutating a half-done run's
        # input.
        batched = batched.filter(~F.col("batch_id").isin(sorted(done)))
    batched = batched.persist()

    todo = sorted(
        r.batch_id for r in batched.select("batch_id").distinct().collect()
    )
    ran = 0
    summary = {"run_id": run_id, "batches_run": 0, "n_docs": 0, "n_spans": 0, "n_errors": 0}
    for b in todo:
        if max_batches is not None and ran >= max_batches:
            break
        t0 = time.monotonic()
        batch_df = batched.filter(F.col("batch_id") == b).select("doc_id", "spans")
        extracted = extract(batch_df, salt_threshold=salt_threshold, mode=mode)
        good, bad = split_quarantine(extracted)
        # data write first; lineage append second (= the commit point)
        good.withColumn("batch_id", F.lit(b)).write.mode("overwrite").parquet(
            f"{out_dir}/data/batch_id={b}"
        )
        bad.withColumn("batch_id", F.lit(b)).write.mode("overwrite").parquet(
            f"{out_dir}/quarantine/batch_id={b}"
        )
        stats = (
            spark.read.parquet(f"{out_dir}/data/batch_id={b}")
            .agg(
                F.count("*").alias("nd"),
                F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("ns"),
                F.min("doc_id").alias("dmin"),
                F.max("doc_id").alias("dmax"),
            )
            .collect()[0]
        )
        n_err = spark.read.parquet(f"{out_dir}/quarantine/batch_id={b}").count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        row = [
            (
                run_id,
                b,
                n_batches,
                b,
                stats.dmin,
                stats.dmax,
                stats.nd,
                stats.ns,
                n_err,
                wall_ms,
                "committed",
                _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
            )
        ]
        spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            f"{out_dir}/lineage"
        )
        ran += 1
        summary["batches_run"] = ran
        summary["n_docs"] += stats.nd
        summary["n_spans"] += int(stats.ns)
        summary["n_errors"] += n_err
    batched.unpersist()
    return summary


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/data").select("doc_id", "spans")


def metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-run rollup over the lineage table (docs/sec, spans/doc,
    parse-failure rate) — the P12 metrics job."""
    lin = spark.read.parquet(f"{out_dir}/lineage")
    return lin.groupBy("run_id").agg(
        F.count("*").alias("batches"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_errors").alias("errors"),
        F.sum("wall_ms").alias("wall_ms"),
        F.round(F.sum("n_docs") / (F.sum("wall_ms") / 1000.0), 2).alias("docs_per_sec"),
        F.round(F.sum("n_spans") / F.sum("n_docs"), 2).alias("spans_per_doc"),
        F.round(F.sum("n_errors") / (F.sum("n_docs") + F.sum("n_errors")), 4).alias(
            "error_rate"
        ),
    )
