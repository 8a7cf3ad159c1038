"""Single-file CLI (python -m freki_spark) — upstream `freki` command
parity: output must equal the independent oracle's rendering."""

from __future__ import annotations

import sys

import pytest

from freki_spark import __main__ as cli
from freki_spark import fixtures, oracle, spec


def _xml_of(doc):
    return (
        "".join(s["text"] for s in doc["spans"] if s["kind"] in spec.XML_KINDS),
        next(s["kind"] for s in doc["spans"] if s["kind"] in spec.XML_KINDS),
    )


@pytest.mark.parametrize("profile", ["random", "two_col", "font_split"])
def test_cli_equals_oracle(tmp_path, capsys, profile):
    doc = fixtures.make_doc(f"cli-{profile}", 42, profile)
    xml, kind = _xml_of(doc)
    src = tmp_path / "in.xml"
    src.write_text(xml, encoding="utf-8")

    rc = cli.main([str(src), "-", "--doc-id", doc["doc_id"]])
    assert rc == 0
    got = capsys.readouterr().out

    spans = [{"kind": kind, "text": xml, "media_ref": "", "offset": 0}]
    want_rows, want_err = oracle.extract_document(doc["doc_id"], spans)
    assert want_err is None
    want = "\n".join(r["text"] for r in want_rows) + "\n"
    assert got == want


def test_cli_sniffs_all_dialects(tmp_path):
    d = fixtures.make_doc("sniff-x", 7, "random")
    xml, kind = _xml_of(d)
    assert cli.sniff_dialect(xml) == kind
    h = fixtures.make_html_doc("sniff-h", 7, "article")
    html = "".join(s["text"] for s in h["spans"] if s["kind"] == spec.KIND_HTML)
    assert cli.sniff_dialect(html) == spec.KIND_HTML


def test_cli_html_writes_file(tmp_path):
    h = fixtures.make_html_doc("cli-h", 42, "article")
    html = "".join(s["text"] for s in h["spans"] if s["kind"] == spec.KIND_HTML)
    src = tmp_path / "page.html"
    src.write_text(html, encoding="utf-8")
    out = tmp_path / "page.freki"
    assert cli.main([str(src), str(out), "-r", "html"]) == 0
    text = out.read_text(encoding="utf-8")
    assert text.startswith("doc_id=page block_id=b-1")
    assert "line=1 " in text


def test_cli_corrupt_input_exits_nonzero(tmp_path):
    d = fixtures.make_doc("cli-bad", 42, "corrupt")
    xml, kind = _xml_of(d)
    src = tmp_path / "bad.xml"
    src.write_text(xml, encoding="utf-8")
    with pytest.raises(SystemExit) as e:
        cli.main([str(src), "-", "-r", "tetml" if kind == spec.KIND_TETML else "pdfminer"])
    assert "extraction failed" in str(e.value)
