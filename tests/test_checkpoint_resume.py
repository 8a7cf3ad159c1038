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


# ---------------------------------------------------------------------------
# Value pin for the rows-only checkpoint_lineage driver entry (round-3
# verdict item 5): the lineage table's xxhash64 batch ids have no SQL
# oracle, so pin exact batch membership and per-batch counts against a
# PURE-PYTHON xxhash64 recompute (validated against Spark's xxhash64 on
# empty/short/31B/32B/long vectors) plus the independent span oracle.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_XP1, _XP2, _XP3, _XP4, _XP5 = (
    11400714785074694791,
    14029467366897019727,
    1609587929392839161,
    9650029242287828579,
    2870177450012600261,
)


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _xround(acc, inp):
    acc = (acc + inp * _XP2) & _M64
    return (_rotl64(acc, 31) * _XP1) & _M64


def _xmerge(acc, val):
    acc ^= _xround(0, val)
    return (acc * _XP1 + _XP4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 (spec-faithful), the hash behind Spark's xxhash64(seed=42)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            v1 = _xround(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xround(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xround(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xround(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = _xmerge(h, v)
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xround(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def _spark_xxhash64_signed(s: str) -> int:
    h = xxh64(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_xxh64_recompute_matches_spark(spark):
    """The python XXH64 must equal Spark's xxhash64 across the length
    regimes (empty, <4, <8, 4-byte tail, 8-byte lanes, 31/32 stripe
    boundary, long) — otherwise the lineage pin below proves nothing."""
    from pyspark.sql import functions as F

    vals = ["", "a", "abc", "hell", "hello123", "x" * 31, "y" * 32, "z" * 100,
            "lin-0000007"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert _spark_xxhash64_signed(v) == got[v], v


def test_checkpoint_lineage_values_match_python_recompute(spark, tmp_path):
    """Exact batch membership + per-batch (n_docs, n_spans, n_errors)
    against the python xxhash64 batch assignment and the independent
    span ORACLE — the value check the rows-only driver entry lacks."""
    from collections import defaultdict

    from freki_spark import oracle
    from freki_spark.queries import q_checkpoint_lineage

    docs = fixtures.random_docs(24, seed=5, prefix="lin")
    lin = {
        r.batch_id: (r.n_docs, r.n_spans, r.n_errors)
        for r in q_checkpoint_lineage(spark, None).collect()
    }
    want = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        b = _spark_xxhash64_signed(d["doc_id"]) % 4  # python % == pmod
        spans, err = oracle.extract_document(d["doc_id"], d["spans"])
        if err is None:
            want[b][0] += 1
            want[b][1] += len(spans)
        else:
            want[b][2] += 1
    assert lin == {b: tuple(v) for b, v in want.items()}
    assert sum(v[0] for v in lin.values()) == 24  # nothing lost
