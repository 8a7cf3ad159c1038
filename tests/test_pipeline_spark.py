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
    bad_rows = bad.collect()  # one job; a second collect would re-extract
    bad_ids = {r.doc_id for r in bad_rows}
    assert bad_ids == {f"fx-corrupt-{i:02d}" for i in range(4)}
    assert good.filter(good.doc_id.isin(list(bad_ids))).count() == 0
    assert all("error" in r.error for r in bad_rows)


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


def test_risky_docs_route_unsalted(spark):
    """Docs with comments/PIs containing phantom page-start tags must be
    routed to the unsalted (whole-parse) path even above the salt
    threshold — a regex page split cannot see markup context."""
    from freki_spark import kernel, spec

    base = fixtures.make_doc("fx-edge-risky", 7, "single_col")
    dialect = next(s["kind"] for s in base["spans"] if s["kind"] in spec.XML_KINDS)
    xml = "".join(s["text"] for s in base["spans"] if s["kind"] in spec.XML_KINDS)
    i = xml.index(">", xml.index("<", 1 if xml.startswith("<?") else 0)) + 1
    evil = '<!-- <Page number="99"> <page id="p9"> --><?pi <Page number="98"> ?>'
    xml2 = xml[:i] + evil + xml[i:]
    # the splice really does create a phantom split site (the hazard)
    assert len(kernel.split_pages(xml2, dialect)[0]) > len(
        kernel.split_pages(xml, dialect)[0]
    )
    # chunk it so size(spans) > 1 and run with salt_threshold=1
    step = max(1, len(xml2) // 7)
    spans = [
        {"kind": dialect, "text": xml2[j : j + step], "media_ref": "", "offset": k}
        for k, j in enumerate(range(0, len(xml2), step))
    ]
    df = docs_to_df(spark, [{"doc_id": "fx-edge-risky", "spans": spans}])
    want, werr = kernel.extract_document_rows("fx-edge-risky", spans)
    assert werr is None and want
    got = extract(df, salt_threshold=1).collect()
    assert len(got) == 1 and got[0].error is None
    assert [[s.kind, s.text, s.media_ref, s.offset] for s in got[0].spans] == [
        [r["kind"], r["text"], r["media_ref"], r["offset"]] for r in want
    ]


def test_leading_pi_is_risky_but_xml_decl_is_not(spark):
    """A document-leading PI ('<?pi ... ?>') must flag risky; a true XML
    declaration must NOT (else every doc routes unsalted)."""
    from freki_spark import spec
    from freki_spark.pipeline import extract_salted

    decl_doc = {
        "doc_id": "d-decl",
        "spans": [
            {
                "kind": spec.KIND_TETML,
                "text": '<?xml version="1.0"?>\n<TET></TET>',
                "media_ref": "",
                "offset": 0,
            },
            {"kind": spec.KIND_MEDIA, "text": "fig", "media_ref": "m:0", "offset": 1},
        ],
    }
    pi_doc = {
        "doc_id": "d-pi",
        "spans": [
            {
                "kind": spec.KIND_TETML,
                "text": '<?pi <Page number="9"> ?><TET></TET>',
                "media_ref": "",
                "offset": 0,
            },
            {"kind": spec.KIND_MEDIA, "text": "fig", "media_ref": "m:0", "offset": 1},
        ],
    }
    df = docs_to_df(spark, [decl_doc, pi_doc])
    # with threshold 0 every non-risky doc goes salted; both docs must
    # still produce their media span with no error on either path
    for thr in (0, 10_000):
        got = {r.doc_id: r for r in extract(df, salt_threshold=thr).collect()}
        assert set(got) == {"d-decl", "d-pi"}
        for r in got.values():
            assert r.error is None, (r.doc_id, r.error)
            assert [[s.kind, s.media_ref, s.offset] for s in r.spans] == [
                ["media", "m:0", 0]
            ]
    # and the decl doc really exercises the salted plan (not re-routed):
    # running it through extract_salted directly gives the same answer
    got_s = extract_salted(docs_to_df(spark, [decl_doc])).collect()
    assert len(got_s) == 1 and got_s[0].error is None
    assert [[s.kind, s.media_ref, s.offset] for s in got_s[0].spans] == [
        ["media", "m:0", 0]
    ]


def test_null_and_empty_spans_surface(spark):
    """NULL or empty spans must yield (doc_id, [], null error) — never
    vanish and never quarantine."""
    from freki_spark.pipeline import DOC_SCHEMA

    df = spark.createDataFrame(
        [("d-null", None), ("d-empty", [])], DOC_SCHEMA
    )
    for thr in (1, 10_000):
        got = {r.doc_id: r for r in extract(df, salt_threshold=thr).collect()}
        assert set(got) == {"d-null", "d-empty"}
        for r in got.values():
            assert r.error is None and list(r.spans or []) == []


def test_media_only_doc_salted_parity(spark):
    """A doc with no XML chunks (media spans only) must pass through
    both paths identically, media in input-offset order."""
    doc = {
        "doc_id": "d-media",
        "spans": [
            {"kind": "media", "text": f"fig{i}", "media_ref": f"m:{i}", "offset": i}
            for i in range(3)
        ],
    }
    df = docs_to_df(spark, [doc])
    for thr in (1, 10_000):
        got = extract(df, salt_threshold=thr).collect()
        assert len(got) == 1 and got[0].error is None
        assert [[s.kind, s.text, s.media_ref, s.offset] for s in got[0].spans] == [
            ["media", f"fig{i}", f"m:{i}", i] for i in range(3)
        ]


def test_salted_quarantine_error_text_parity(spark):
    """The salted path must quarantine with the SAME error text as the
    unsalted path (both report the whole-document parse error)."""
    docs = [fixtures.make_doc("fx-corrupt-00", 42, "corrupt")]
    df = docs_to_df(spark, docs)
    unsalted = extract(df).collect()[0]
    salted = extract(df, salt_threshold=1).collect()[0]
    assert unsalted.error is not None
    assert salted.error == unsalted.error


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


def test_html_dialect_through_pipeline(spark):
    """kind='html' docs run the HtmlSpec extractor through the same
    pipeline surface: output == kernel rows, and routing keeps them on
    the unsalted path even when the salt threshold would trip."""
    from freki_spark import kernel

    docs = fixtures.html_fixture_matrix()[:12]
    df = docs_to_df(spark, docs)
    want = {d["doc_id"]: kernel.extract_document_rows(d["doc_id"], d["spans"]) for d in docs}
    for thr in (0, 10_000):  # thr=0: every non-html doc would salt
        got = {r.doc_id: r for r in extract(df, salt_threshold=thr).collect()}
        assert set(got) == set(want)
        for doc_id, (rows, err) in want.items():
            r = got[doc_id]
            assert r.error == err, doc_id
            assert [[s.kind, s.text, s.media_ref, s.offset] for s in r.spans] == [
                [w["kind"], w["text"], w["media_ref"], w["offset"]] for w in rows
            ], doc_id


def test_mixed_xml_html_corpus(spark):
    """One input table holding both dialects plus corrupt XML: every doc
    routes to its dialect's extractor; quarantine untouched."""
    docs = [
        fixtures.make_doc("mx-xml-0", 42, "single_col"),
        fixtures.make_html_doc("mx-html-0", 42, "article"),
        fixtures.make_doc("mx-bad-0", 42, "corrupt"),
        fixtures.make_html_doc("mx-html-1", 42, "img_media"),
        fixtures.make_doc("mx-xml-1", 42, "media"),
    ]
    from freki_spark import kernel

    df = docs_to_df(spark, docs)
    got = {r.doc_id: r for r in extract(df).collect()}
    assert set(got) == {d["doc_id"] for d in docs}
    for d in docs:
        rows, err = kernel.extract_document_rows(d["doc_id"], d["spans"])
        r = got[d["doc_id"]]
        assert r.error == err, d["doc_id"]
        assert [[s.kind, s.text, s.media_ref, s.offset] for s in r.spans] == [
            [w["kind"], w["text"], w["media_ref"], w["offset"]] for w in rows
        ], d["doc_id"]
    assert got["mx-bad-0"].error is not None


# ---------------------------------------------------------------------------
# review-found salted-path divergences (regression pins)
# ---------------------------------------------------------------------------


def test_chunk_boundary_split_comment_routes_unsalted(spark):
    """'<' ending one chunk and '!--' starting the next must still flag
    the doc risky (whole-parse path): the comment could hold '<Page'
    and create phantom piece boundaries on the salted path."""
    from freki_spark import kernel as K

    body = (
        '<TET><Page number="1"><Word><Text>alpha</Text>'
        '<Box llx="1" lly="1" urx="9" ury="9"/></Word></Page>'
        "<!-- <Page number=\"7\"> phantom --></TET>"
    )
    cut = body.index("<!--") + 1  # split right after the '<'
    spans = [
        {"kind": "tetml", "text": body[:cut], "media_ref": "", "offset": 0},
        {"kind": "tetml", "text": body[cut:], "media_ref": "", "offset": 1},
    ]
    df = docs_to_df(spark, [{"doc_id": "split-bang", "spans": spans}])
    # salt_threshold=1 would salt this doc if the risky flag missed it
    out = {r.doc_id: r for r in extract(df, salt_threshold=1).collect()}
    ref_rows, ref_err = K.extract_document_rows(
        "split-bang", [dict(s) for s in spans]
    )
    got = [(s.kind, s.text, s.media_ref, s.offset) for s in out["split-bang"].spans]
    want = [(r["kind"], r["text"], r["media_ref"], r["offset"]) for r in ref_rows]
    assert got == want and out["split-bang"].error == ref_err


def test_salted_zero_record_doc_survives(spark):
    """A doc whose shards emit zero span records (all-empty pages, no
    media) must still appear as (doc_id, [], null) — same as unsalted."""
    spans = [
        {"kind": "tetml", "text": "<TET><Page number='1'/>", "media_ref": "", "offset": 0},
        {"kind": "tetml", "text": "<Page number='2'/></TET>", "media_ref": "", "offset": 1},
    ]
    df = docs_to_df(spark, [{"doc_id": "empty-mega", "spans": spans}])
    salted = {r.doc_id: r for r in extract(df, salt_threshold=1).collect()}
    unsalted = {r.doc_id: r for r in extract(df, salt_threshold=100).collect()}
    assert "empty-mega" in salted, "doc vanished on the salted path"
    assert salted["empty-mega"].error is None
    assert list(salted["empty-mega"].spans) == list(unsalted["empty-mega"].spans) == []


def test_selfclosing_final_page_salted_parity(spark):
    """A mega-doc ending with a self-closed page must extract the same
    spans salted and unsalted (repair_page_piece used to drag '</TET>'
    into the wrapped parse and quarantine the doc)."""
    spans = [
        {
            "kind": "tetml",
            "text": (
                "<TET><Page number='1'><Word><Text>w1</Text>"
                "<Box llx='1' lly='1' urx='9' ury='9'/></Word></Page>"
            ),
            "media_ref": "",
            "offset": 0,
        },
        {"kind": "tetml", "text": "<Page number='2'/></TET>", "media_ref": "", "offset": 1},
    ]
    df = docs_to_df(spark, [{"doc_id": "sc-final", "spans": spans}])
    salted = {r.doc_id: r for r in extract(df, salt_threshold=1).collect()}
    unsalted = {r.doc_id: r for r in extract(df, salt_threshold=100).collect()}
    assert salted["sc-final"].error is None, salted["sc-final"].error
    assert list(salted["sc-final"].spans) == list(unsalted["sc-final"].spans)
    assert len(salted["sc-final"].spans) > 0


def test_namespaced_pages_salted_parity(spark):
    """Namespace-prefixed page elements must split (and anchor media)
    identically to how the parsers read them — the old '<Page\\b' regex
    found zero pieces and the doc vanished from the salted path."""
    spans = [
        {
            "kind": "tetml",
            "text": (
                "<t:TET xmlns:t='urn:x'><t:Page number='1'><t:Word>"
                "<t:Text>ns1</t:Text><t:Box llx='1' lly='1' urx='9' ury='9'/>"
                "</t:Word></t:Page>"
            ),
            "media_ref": "",
            "offset": 0,
        },
        {
            "kind": "tetml",
            "text": (
                "<t:Page number='2'><t:Word><t:Text>ns2</t:Text>"
                "<t:Box llx='1' lly='1' urx='9' ury='9'/></t:Word></t:Page></t:TET>"
            ),
            "media_ref": "",
            "offset": 1,
        },
    ]
    df = docs_to_df(spark, [{"doc_id": "ns-mega", "spans": spans}])
    salted = {r.doc_id: r for r in extract(df, salt_threshold=1).collect()}
    unsalted = {r.doc_id: r for r in extract(df, salt_threshold=100).collect()}
    assert "ns-mega" in salted, "namespaced doc vanished on the salted path"
    assert salted["ns-mega"].error is None, salted["ns-mega"].error
    assert list(salted["ns-mega"].spans) == list(unsalted["ns-mega"].spans)
    texts = " ".join(s.text for s in salted["ns-mega"].spans)
    assert "ns1" in texts and "ns2" in texts


def test_reader_survives_hostile_doc_ids(spark):
    """A doc_id containing 'page=NN block_id=...' lookalikes must not
    corrupt the parsed block-header fields (the tail regex is
    $-anchored, so only the true rendered fields can match)."""
    from freki_spark.reader import read_freki_spans

    hostile = "report_page=12.pdf block_id=9-9 bbox=7,7,8,8 5 6"
    header = f"doc_id={hostile} page=3 block_id=3-1 bbox=1.0,2.0,9.0,8.0 4 5"
    df = spark.createDataFrame(
        [(hostile, "block", header, "", 0)],
        "doc_id string, kind string, text string, media_ref string, offset int",
    )
    r = read_freki_spans(df).collect()[0]
    assert (r.page, r.block_k) == (3, 1)
    assert (r.llx, r.lly, r.urx, r.ury) == (1.0, 2.0, 9.0, 8.0)
    assert (r.start_line, r.end_line) == (4, 5)


def test_block_label_render_and_roundtrip(spark):
    """Optional block label (upstream: the igtdetect classifier stage):
    rendered as 'label=<l>' between bbox and the line range only when
    non-empty, and parsed back by the reader (NULL when absent)."""
    from freki_spark.grammar import render_block_header
    from freki_spark.reader import read_freki_spans

    labeled = render_block_header("d", 1, 2, 72.0, 10.0, 540.0, 20.5, 3, 5, label="L")
    plain = render_block_header("d", 1, 2, 72.0, 10.0, 540.0, 20.5, 3, 5)
    assert " label=L 3 5" in labeled
    assert "label=" not in plain
    df = spark.createDataFrame(
        [("d", "block", labeled, "", 0), ("d", "block", plain, "", 1)],
        "doc_id string, kind string, text string, media_ref string, offset int",
    )
    rows = {r.offset: r for r in read_freki_spans(df).collect()}
    assert rows[0].label == "L"
    assert (rows[0].start_line, rows[0].end_line) == (3, 5)
    assert rows[1].label is None
    assert (rows[1].start_line, rows[1].end_line) == (3, 5)


def test_block_label_with_whitespace_is_rejected():
    """A label containing whitespace cannot be represented in the
    'label=\\S+' grammar — the reader would NULL every field of the
    header.  The renderer must refuse, not silently corrupt."""
    import pytest

    from freki_spark.grammar import render_block_header

    # "U\n" pins the fullmatch requirement: re.match(r"^\S+$") accepts a
    # trailing newline, which would split the rendered header line
    for bad in ("two words", "tab\tsep", "nl\nx", " lead", "trail ", "U\n"):
        with pytest.raises(ValueError, match="not representable"):
            render_block_header(
                "d", 1, 2, 72.0, 10.0, 540.0, 20.5, 3, 5, label=bad
            )
