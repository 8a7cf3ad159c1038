"""End-to-end Spark pipeline tests: distributed output must equal the
single-node oracle goldens span-for-span — unsalted, salted, and
applyInPandas-mode paths all converge to identical bytes
(BASELINE.json equality invariant)."""

from __future__ import annotations

import json
import os

import pytest

from freki_spark import fixtures
from freki_spark.io import docs_to_df
from freki_spark.pipeline import extract, extract_simple, split_quarantine

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fixture_goldens.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def matrix_df(spark):
    return docs_to_df(spark, fixtures.fixture_matrix()).cache()


def _collect_spans(df):
    out = {}
    for row in df.collect():
        out[row.doc_id] = {
            "error": row.error,
            "spans": [[s.kind, s.text, s.media_ref, s.offset] for s in (row.spans or [])],
        }
    return out


def _assert_matches_golden(got, golden):
    assert set(got) == set(golden)
    for doc_id, g in golden.items():
        r = got[doc_id]
        assert (r["error"] is None) == (g["error"] is None), (doc_id, r["error"])
        assert r["spans"] == g["spans"], doc_id


def test_extract_unsalted_matches_goldens(spark, matrix_df, golden):
    got = _collect_spans(extract(matrix_df))
    _assert_matches_golden(got, golden)


def test_extract_salted_matches_goldens(spark, matrix_df, golden):
    # force (nearly) every doc down the salted page-parallel path;
    # output must be byte-identical to the unsalted/golden spans (S7)
    got = _collect_spans(extract(matrix_df, salt_threshold=1))
    _assert_matches_golden(got, golden)


def test_extract_group_mode_matches_goldens(spark, matrix_df, golden):
    got = _collect_spans(extract_simple(matrix_df, mode="group"))
    _assert_matches_golden(got, golden)


def test_quarantine_split(spark, matrix_df):
    good, bad = split_quarantine(extract(matrix_df))
    bad_ids = {r.doc_id for r in bad.collect()}
    assert bad_ids == {f"fx-corrupt-{i:02d}" for i in range(4)}
    assert good.filter(good.doc_id.isin(list(bad_ids))).count() == 0
    errors = {r.error for r in bad.collect()}
    assert all("error" in e for e in errors)


def test_salted_quarantine(spark, golden):
    # corrupt mega-doc: route a corrupt doc down the salted path
    docs = [fixtures.make_doc("fx-corrupt-00", 42, "corrupt")]
    df = docs_to_df(spark, docs)
    res = extract(df, salt_threshold=1).collect()
    assert len(res) == 1
    assert res[0].error is not None
    assert res[0].spans == []


def test_output_schema_stable(spark, matrix_df):
    out = extract(matrix_df)
    assert (
        out.schema.simpleString()
        == "struct<doc_id:string,spans:array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>,error:string>"
    )


def test_freki_read_roundtrip(spark, matrix_df, golden):
    """Reader (FrekiDoc.read parity): structured re-parse of rendered
    spans must recover the block/line grammar fields consistently."""
    from pyspark.sql import functions as F

    from freki_spark.reader import blocks, lines, read_freki_docs

    good, _ = split_quarantine(extract(matrix_df))
    parsed = read_freki_docs(good).cache()

    b = blocks(parsed)
    l = lines(parsed)
    n_blocks = b.count()
    n_lines = l.count()
    assert n_blocks > 0 and n_lines > 0

    # every block parsed all numeric fields (no NULL from a regex miss)
    assert (
        b.filter(
            F.col("page").isNull()
            | F.col("block_k").isNull()
            | F.col("llx").isNull()
            | F.col("start_line").isNull()
        ).count()
        == 0
    )
    # bbox is a real box
    assert b.filter((F.col("urx") < F.col("llx")) | (F.col("ury") < F.col("lly"))).count() == 0

    # per doc: the union of block [start_line, end_line] ranges covers
    # exactly the set of parsed line numbers (1..n_lines, reading order)
    rng = b.groupBy("doc_id").agg(
        F.min("start_line").alias("lo"),
        F.max("end_line").alias("hi"),
        F.sum(F.col("end_line") - F.col("start_line") + 1).alias("covered"),
    )
    ln = l.groupBy("doc_id").agg(
        F.min("line_no").alias("l_lo"),
        F.max("line_no").alias("l_hi"),
        F.count("*").alias("n"),
    )
    j = rng.join(ln, "doc_id")
    bad = j.filter(
        (F.col("lo") != F.col("l_lo"))
        | (F.col("hi") != F.col("l_hi"))
        | (F.col("covered") != F.col("n"))
    )
    assert bad.count() == 0, bad.collect()

    # line bodies never retain the metadata prefix
    assert l.filter(F.col("body").rlike(r"^line=\d+ fonts=")).count() == 0


def test_extract_fast_path_is_narrow(spark, matrix_df):
    """The 100 TB invariant: the unsalted extraction path must contain
    no Exchange — document bytes never shuffle."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_simple(matrix_df, mode="map").explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan, plan
