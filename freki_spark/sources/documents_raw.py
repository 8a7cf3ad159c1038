"""Distributed synthesis of the span-shaped pipeline input from the
driver's flat ``documents`` table (TESTDATA.md).

The driver testdata has no span-shaped table (FIXTURES.md §1 note), so
the flagship entry and the benchmarks wrap each document's plain text
into deterministic TETML glyph XML — pure function of (doc_id, text) —
via ``mapInPandas`` (distributed, no driver-side loop, no shuffle).

Geometry: fixed 12pt font, 0.5*size char advance, wrap at the right
margin, 40 lines per page; every 5th doc gets a media span appended
mid-document.  That yields real multi-page layout work per doc while
staying byte-deterministic for the rows-only correctness checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .. import spec
from ..pipeline import DOC_SCHEMA

PAGE_W, PAGE_H, MARGIN = 612.0, 792.0, 72.0
SIZE = 12.0
CW = 0.5 * SIZE
LINES_PER_PAGE = 40
LEAD = SIZE * 1.4


def text_to_tetml(text: str) -> str:
    words = [w for w in text.split(" ") if w]
    pages: list[list[str]] = []
    cur_page: list[str] = []
    x, nline = MARGIN, 0
    y = PAGE_H - MARGIN
    for w in words:
        # width and glyph char come from the RAW word; escaping is
        # per-XML-field (escaping first made '&amp;' 5 glyphs wide and
        # emitted the raw '&' first char as unparseable element text,
        # silently quarantining any doc with a '&'-leading token)
        esc = w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        c0 = w[0].replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        wid = CW * len(w)
        if x + wid > PAGE_W - MARGIN:
            x = MARGIN
            y -= LEAD
            nline += 1
            if nline >= LINES_PER_PAGE:
                pages.append(cur_page)
                cur_page = []
                nline = 0
                y = PAGE_H - MARGIN
        cur_page.append(
            f"<Word><Text>{esc}</Text>"
            f'<Box llx="{x:.2f}" lly="{y:.2f}" urx="{x + wid:.2f}" ury="{y + SIZE:.2f}"/>'
            f'<Glyph font="F0" size="{SIZE:.1f}">{c0}</Glyph></Word>'
        )
        x += wid + CW
    pages.append(cur_page)
    out = ["<TET><Document><Pages>"]
    for pno, words_xml in enumerate(pages, start=1):
        out.append(
            f'<Page number="{pno}" width="{PAGE_W:.2f}" height="{PAGE_H:.2f}"><Content>'
        )
        out.extend(words_xml)
        out.append("</Content></Page>")
    out.append("</Pages></Document></TET>")
    return "\n".join(out)


def _synth_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids, spans_col = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            xml = text_to_tetml(text)
            cut = len(xml) // 2
            spans = [
                {"kind": spec.KIND_TETML, "text": xml[:cut], "media_ref": "", "offset": 0}
            ]
            if int(doc_id) % 5 == 0:
                spans.append(
                    {
                        "kind": spec.KIND_MEDIA,
                        "text": "",
                        "media_ref": f"img://{doc_id}/0",
                        "offset": 1,
                    }
                )
            spans.append(
                {
                    "kind": spec.KIND_TETML,
                    "text": xml[cut:],
                    "media_ref": "",
                    "offset": len(spans),
                }
            )
            ids.append(str(doc_id))
            spans_col.append(spans)
        yield pd.DataFrame({"doc_id": ids, "spans": spans_col})


def synthesize_raw(documents: DataFrame) -> DataFrame:
    """(doc_id int, text string, ...) -> (doc_id string, spans)."""
    return documents.select("doc_id", "text").mapInPandas(_synth_batch, DOC_SCHEMA)
