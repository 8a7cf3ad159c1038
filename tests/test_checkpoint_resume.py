"""Resume / lineage tests (SURVEY.md §5.2 item 5): kill after a
partial run, resume, assert no duplicates and output identical to a
single-shot run.  Also the determinism test (§5.2 item 6 correctness
side): different parallelism must yield identical spans."""

from __future__ import annotations

import pytest

from freki_spark import fixtures
from freki_spark.checkpoint import (
    committed_batches,
    metrics,
    read_output,
    run_extraction,
)
from freki_spark.io import docs_to_df
from freki_spark.pipeline import extract


@pytest.fixture(scope="module")
def docs():
    return fixtures.random_docs(60, seed=11, prefix="ck")


def _spans_map(df):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in df.collect()
    }


def test_resume_no_duplicates_and_identical(spark, docs, tmp_path):
    df = docs_to_df(spark, docs)
    one_shot = tmp_path / "oneshot"
    resumed = tmp_path / "resumed"

    s1 = run_extraction(spark, df, str(one_shot), run_id="r1", n_batches=6)
    assert s1["batches_run"] == 6

    # killed run: only 2 of 6 batches commit
    s2 = run_extraction(spark, df, str(resumed), run_id="r2a", n_batches=6, max_batches=2)
    assert s2["batches_run"] == 2
    assert committed_batches(spark, str(resumed)) != set(range(6))

    # resume: the rest commit, already-done batches are skipped
    s3 = run_extraction(spark, df, str(resumed), run_id="r2b", n_batches=6)
    assert s3["batches_run"] == 4
    assert committed_batches(spark, str(resumed)) == committed_batches(
        spark, str(one_shot)
    )

    a = _spans_map(read_output(spark, str(one_shot)))
    b = _spans_map(read_output(spark, str(resumed)))
    assert a == b
    # no duplicates
    out = read_output(spark, str(resumed))
    assert out.count() == out.select("doc_id").distinct().count()

    # third run is a no-op
    s4 = run_extraction(spark, df, str(resumed), run_id="r2c", n_batches=6)
    assert s4["batches_run"] == 0


def test_lineage_metrics(spark, docs, tmp_path):
    df = docs_to_df(spark, docs)
    out = tmp_path / "m"
    run_extraction(spark, df, str(out), run_id="m1", n_batches=3)
    m = {r.run_id: r for r in metrics(spark, str(out)).collect()}
    assert m["m1"].docs + m["m1"].errors == len(docs)
    assert m["m1"].spans > 0
    assert m["m1"].errors >= 1  # random_docs(60) plants one corrupt doc
    assert m["m1"].docs_per_sec > 0


def test_determinism_across_parallelism(spark, docs):
    df = docs_to_df(spark, docs)
    base = _spans_map(
        extract(df.repartition(1), salt_threshold=20)
        .filter("error is null")
        .select("doc_id", "spans")
    )
    wide = _spans_map(
        extract(df.repartition(16), salt_threshold=20)
        .filter("error is null")
        .select("doc_id", "spans")
    )
    assert base == wide


def test_stream_extract_incremental(spark, docs, tmp_path):
    """Streaming extraction: new source files are processed on the next
    trigger; already-seen files are never reprocessed (source offsets in
    the streaming checkpoint), and the union equals batch extraction."""
    from freki_spark.streaming.jobs import stream_extract

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    first, second = docs[:40], docs[40:]

    def accounted(path: str) -> set:
        ids = {r.doc_id for r in spark.read.parquet(f"{path}/data").collect()}
        ids |= {r.doc_id for r in spark.read.parquet(f"{path}/quarantine").collect()}
        return ids

    docs_to_df(spark, first).repartition(4).write.mode("append").parquet(src)
    stream_extract(spark, src, out)
    assert accounted(out) == {d["doc_id"] for d in first}

    docs_to_df(spark, second).repartition(4).write.mode("append").parquet(src)
    stream_extract(spark, src, out)
    all_rows = spark.read.parquet(f"{out}/data")
    # exactly once: no doc extracted twice across the two triggers
    assert all_rows.count() == all_rows.select("doc_id").distinct().count()
    assert accounted(out) == {d["doc_id"] for d in docs}
    got2 = _spans_map(all_rows)

    # span-for-span identical to the one-shot batch pipeline
    batch = _spans_map(
        extract(docs_to_df(spark, docs)).filter("error IS NULL").select("doc_id", "spans")
    )
    assert got2 == batch


def test_resume_ignores_partial_uncommitted_batch(spark, docs, tmp_path):
    """A killed run leaves partially-written parquet in an UNCOMMITTED
    batch dir.  Resume must not count those docs as done (they would be
    skipped while the overwrite destroys the partial data — data loss);
    it must re-run the whole batch and converge to the one-shot output."""
    from pyspark.sql import functions as F

    df = docs_to_df(spark, docs)
    out = tmp_path / "partial"

    s1 = run_extraction(spark, df, str(out), run_id="p1", n_batches=6, max_batches=2)
    assert s1["batches_run"] == 2
    done = committed_batches(spark, str(out))
    victim = min(set(range(6)) - done)

    # simulate the kill: half of the victim batch's docs already written
    # to its data dir, with NO lineage row
    batched = df.withColumn(
        "batch_id", F.pmod(F.xxhash64("doc_id"), F.lit(6)).cast("int")
    )
    partial = (
        extract(batched.filter(F.col("batch_id") == victim).select("doc_id", "spans"))
        .filter(F.col("error").isNull())
        .select("doc_id", "spans")
        .limit(5)
        .withColumn("batch_id", F.lit(victim))
    )
    partial.write.mode("overwrite").parquet(str(out / "data" / f"batch_id={victim}"))

    s2 = run_extraction(spark, df, str(out), run_id="p2", n_batches=6)
    assert s2["batches_run"] == 4

    one_shot = tmp_path / "oneshot2"
    run_extraction(spark, df, str(one_shot), run_id="q1", n_batches=6)
    assert _spans_map(read_output(spark, str(out))) == _spans_map(
        read_output(spark, str(one_shot))
    )


def test_resume_rejects_changed_n_batches(spark, docs, tmp_path):
    df = docs_to_df(spark, docs)
    out = tmp_path / "nb"
    run_extraction(spark, df, str(out), run_id="n1", n_batches=4, max_batches=1)
    with pytest.raises(ValueError, match="n_batches"):
        run_extraction(spark, df, str(out), run_id="n2", n_batches=8)
