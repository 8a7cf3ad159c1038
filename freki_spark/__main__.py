"""Single-file CLI — upstream `freki` command parity.

The reference's primary UX is `freki <in.xml> <out.freki> -r
tetml|pdfminer` (freki/main.py [U], SURVEY.md §3.1): one document in,
one freki-format file out, no cluster.  This module provides the same
surface over the graft's kernel, purely local (numpy only — no Spark
session, no JVM), so a user of the reference can switch tools without
changing their workflow; the cluster path (`jobs/extract.py` via
spark-submit) runs the identical kernel at 10^12-doc scale.

    python -m freki_spark in.xml out.freki -r tetml
    python -m freki_spark page.html out.freki -r html
    python -m freki_spark in.xml -          # freki text to stdout

`-r auto` (default) sniffs the dialect: TET XML namespace / <Glyph
elements -> tetml; <textline/<textbox -> pdfminer-xml; anything with
an <html or <!DOCTYPE html prefix -> html.
"""

from __future__ import annotations

import argparse
import os
import sys

from . import spec
from .kernel import extract_document_rows

DIALECTS = {
    "tetml": spec.KIND_TETML,
    "pdfminer": spec.KIND_PDFMINER,
    "html": spec.KIND_HTML,
}


def sniff_dialect(text: str) -> str:
    head = text[:4096]
    low = head.lower()
    if "<!doctype html" in low or "<html" in low:
        return spec.KIND_HTML
    if "<textline" in head or "<textbox" in head or "pdf2txt" in head:
        return spec.KIND_PDFMINER
    # structural markers only — a bare 'TET' substring would misroute
    # unrelated text (e.g. a title containing 'TETHERED') to the TETML
    # parser instead of the accurate cannot-sniff error
    if (
        "<Glyph" in text
        or "<Word" in head
        or "<TET" in head
        or "pdflib.com/XML/TET" in head
    ):
        return spec.KIND_TETML
    raise SystemExit(
        "cannot sniff dialect (no TETML/pdfminer/HTML markers) — pass -r"
    )


def extract_file_text(text: str, kind: str, doc_id: str) -> str:
    """One document -> full freki file text (spans joined by newlines,
    the same rendering `freki_write` hashes in the Spark path)."""
    spans = [{"kind": kind, "text": text, "media_ref": "", "offset": 0}]
    rows, err = extract_document_rows(doc_id, spans)
    if err is not None:
        raise SystemExit(f"extraction failed: {err}")
    return "\n".join(r["text"] for r in rows)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m freki_spark",
        description="Extract one PDF-XML / HTML document to freki format "
        "(single-node; use jobs/extract.py + spark-submit for corpora).",
    )
    ap.add_argument("input", help="TETML / pdfminer-XML / HTML file")
    ap.add_argument("output", help="output freki file, or - for stdout")
    ap.add_argument(
        "-r",
        "--reader",
        choices=[*DIALECTS, "auto"],
        default="auto",
        help="input dialect (default: sniff)",
    )
    ap.add_argument(
        "--doc-id", default=None, help="doc_id in block headers (default: stem)"
    )
    args = ap.parse_args(argv)

    with open(args.input, encoding="utf-8") as f:
        text = f.read()
    kind = DIALECTS[args.reader] if args.reader != "auto" else sniff_dialect(text)
    doc_id = args.doc_id or os.path.splitext(os.path.basename(args.input))[0]

    out = extract_file_text(text, kind, doc_id)
    if args.output == "-":
        sys.stdout.write(out + "\n")
    else:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
