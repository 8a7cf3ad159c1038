"""Deterministic synthetic span-document generator (FIXTURES.md §1/§3).

Generates interleaved text+media documents in the authoritative input
shape ``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``:
``kind in ('tetml','pdfminer-xml')`` rows carry chunks of glyph-level
XML, ``kind='media'`` rows carry media_ref pointers anchored at input
positions.  Pure function of (doc_id, seed) — the same doc_id always
yields byte-identical spans, so the generator can run distributed
(mapInPandas over an id range) and the oracle can recompute goldens
anywhere.

The synthetic page geometry is chosen to exercise every FrekiSpec v1
code path: y-overlap line clustering incl. superscripts (S2),
gap-proportional spacing incl. tabular alignment (S3), two-column
whitespace channels with full-width headers/footers (S4), vertical-gap
and font-change block splits (S5), media interleaving (S6), mega-doc
salting (S7) and the corrupt-XML quarantine path.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from . import spec

PAGE_W = 612.0
PAGE_H = 792.0
MARGIN = 72.0

_WORDS = (
    "the data spark layout line block page glyph token text column "
    "word font south north river linguistic corpus model table cell "
    "alpha beta gamma delta sigma lambda omega kappa zeta theta "
    "ingest shuffle salt merge probe scan emit span anchor offset"
).split()

FONTS = [("F0", 12.0), ("F1", 9.0), ("F2", 10.5)]


@dataclass
class _Word:
    text: str
    llx: float
    lly: float
    urx: float
    ury: float
    font: str
    size: float


def _doc_rng(doc_id: str, seed: int) -> np.random.Generator:
    h = int.from_bytes(hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()[:8], "big")
    return np.random.default_rng(h)


# --------------------------------------------------------------------------
# page geometry
# --------------------------------------------------------------------------


def _gen_line_words(
    rng: np.random.Generator,
    y: float,
    x0: float,
    x1: float,
    font: tuple[str, float],
    tabular: bool = False,
    superscript: bool = False,
) -> list[_Word]:
    """One text line of words between x0..x1 at baseline y."""
    name, size = font
    cw = 0.5 * size
    words: list[_Word] = []
    if tabular:
        # Aligned tab stops; gaps kept < COLUMN_MIN_CHANNEL_PT so
        # tabular pages never fake a column channel.
        stops = [x0, x0 + 70.0, x0 + 140.0, x0 + 210.0]
        for sx in stops:
            w = _WORDS[int(rng.integers(0, len(_WORDS)))][:6]
            wx1 = sx + cw * len(w)
            if wx1 > x1:
                break
            words.append(_Word(w, sx, y, wx1, y + size, name, size))
        return words
    x = x0
    while True:
        w = _WORDS[int(rng.integers(0, len(_WORDS)))]
        wx1 = x + cw * len(w)
        if wx1 > x1 or len(words) >= 14:
            break
        words.append(_Word(w, x, y, wx1, y + size, name, size))
        x = wx1 + cw * float(rng.uniform(0.5, 1.6))
    if superscript and len(words) >= 2:
        # small raised glyph overlapping the line's upper half
        anchor = words[-1]
        s2 = size * 0.6
        words.append(
            _Word(
                "2",
                anchor.urx + 1.0,
                y + size * 0.45,
                anchor.urx + 1.0 + 0.5 * s2,
                y + size * 0.45 + s2,
                anchor.font,
                s2,
            )
        )
    return words


def _gen_page_words(
    rng: np.random.Generator,
    two_column: bool,
    n_blocks: int,
    fonts: list[tuple[str, float]],
    tabular: bool,
    full_width_header: bool,
    three_column: bool = False,
) -> list[_Word]:
    words: list[_Word] = []
    top = PAGE_H - MARGIN

    if full_width_header and two_column:
        words += _gen_line_words(rng, top - 12.0, MARGIN, PAGE_W - MARGIN, fonts[0])
        top -= 40.0

    if three_column:
        # Channels at ~213-240 and ~381-408: centers stay inside the
        # central 40% band even as variable line endings widen them
        # leftward.  Columns share baselines (block structure drawn
        # once, words per column random) so S2 merges each row into one
        # provisional line carrying exactly the two channel gaps — the
        # clean multi-column signal S4 v2 splits on.
        col3 = [(MARGIN, 213.0), (240.0, 381.0), (408.0, PAGE_W - MARGIN)]
        y = top
        font_i = 0
        for _b in range(n_blocks):
            font = fonts[font_i % len(fonts)]
            n_lines = int(rng.integers(2, 6))
            for _li in range(n_lines):
                y -= font[1] * 1.4
                if y < MARGIN:
                    break
                for x0, x1 in col3:
                    words += _gen_line_words(rng, y, x0, x1, font)
            y -= font[1] * 3.0
            if rng.random() < 0.5:
                font_i += 1
        return words

    if two_column:
        col_spans = [(MARGIN, 290.0), (322.0, PAGE_W - MARGIN)]
    else:
        col_spans = [(MARGIN, PAGE_W - MARGIN)]

    for x0, x1 in col_spans:
        y = top
        font_i = 0
        for b in range(n_blocks):
            font = fonts[font_i % len(fonts)]
            n_lines = int(rng.integers(2, 6))
            for li in range(n_lines):
                size = font[1]
                is_tab = tabular and not two_column and b == n_blocks - 1
                sup = (not tabular) and li == 0 and rng.random() < 0.2
                y -= size * 1.4
                if y < MARGIN:
                    break
                words += _gen_line_words(
                    rng, y, x0, x1, font, tabular=is_tab, superscript=sup
                )
            # block gap: 3x the leading => gap far above 1.8 * median
            y -= font[1] * 3.0
            if rng.random() < 0.5:
                font_i += 1  # font-face change also forces a block split
        # footers only on two-column pages (full-width)
    if full_width_header and two_column:
        words += _gen_line_words(
            rng, MARGIN - 20.0 + 14.0, MARGIN, PAGE_W - MARGIN, fonts[0]
        )
    return words


# --------------------------------------------------------------------------
# XML rendering (both dialects)
# --------------------------------------------------------------------------


def _render_tetml(pages: list[list[_Word]], rng: np.random.Generator) -> str:
    out = ["<TET><Document><Pages>"]
    for pno, words in enumerate(pages, start=1):
        out.append(
            f'<Page number="{pno}" width="{PAGE_W:.2f}" height="{PAGE_H:.2f}"><Content>'
        )
        for w in words:
            glyphs = [f'<Glyph font="{w.font}" size="{w.size:.1f}">{w.text[0]}</Glyph>']
            if len(w.text) > 2 and rng.random() < 0.15:
                # minority-font glyph: exercises majority vote in S1
                alt = FONTS[int(rng.integers(0, len(FONTS)))]
                glyphs.append(
                    f'<Glyph font="{alt[0]}" size="{alt[1]:.1f}">{w.text[1]}</Glyph>'
                )
                glyphs.append(
                    f'<Glyph font="{w.font}" size="{w.size:.1f}">{w.text[2]}</Glyph>'
                )
            out.append(
                f"<Word><Text>{w.text}</Text>"
                f'<Box llx="{w.llx:.2f}" lly="{w.lly:.2f}" urx="{w.urx:.2f}" ury="{w.ury:.2f}"/>'
                + "".join(glyphs)
                + "</Word>"
            )
        out.append("</Content></Page>")
    out.append("</Pages></Document></TET>")
    return "\n".join(out)


def _render_pdfminer(pages: list[list[_Word]], rng: np.random.Generator) -> str:
    out = ["<pages>"]
    for pno, words in enumerate(pages, start=1):
        out.append(f'<page id="{pno}" bbox="0.000,0.000,{PAGE_W:.3f},{PAGE_H:.3f}">')
        out.append('<textbox id="0">')
        # group words into crude textlines by lly
        by_y: dict[float, list[_Word]] = {}
        for w in words:
            by_y.setdefault(round(w.lly, 1), []).append(w)
        for y in sorted(by_y, reverse=True):
            ws = sorted(by_y[y], key=lambda w: w.llx)
            lx0 = min(w.llx for w in ws)
            lx1 = max(w.urx for w in ws)
            ly1 = max(w.ury for w in ws)
            out.append(f'<textline bbox="{lx0:.3f},{y:.3f},{lx1:.3f},{ly1:.3f}">')
            for w in ws:
                n = len(w.text)
                step = (w.urx - w.llx) / n
                for i, ch in enumerate(w.text):
                    gx0 = w.llx + i * step
                    gx1 = w.llx + (i + 1) * step
                    out.append(
                        f'<text font="{w.font}" bbox="{gx0:.3f},{w.lly:.3f},{gx1:.3f},{w.ury:.3f}" '
                        f'size="{w.size:.1f}">{ch}</text>'
                    )
                out.append("<text> </text>")
            out.append("</textline>")
        out.append("</textbox>")
        out.append("</page>")
    out.append("</pages>")
    return "\n".join(out)


# --------------------------------------------------------------------------
# document assembly: XML -> chunk spans + interleaved media spans
# --------------------------------------------------------------------------


def _chunk_and_interleave(
    xml: str,
    dialect: str,
    doc_id: str,
    rng: np.random.Generator,
    n_media: int,
    n_chunks: int,
) -> list[dict]:
    n_chunks = max(1, min(n_chunks, len(xml)))
    if n_chunks == 1:
        cuts = []
    else:
        cuts = sorted(
            int(c) for c in rng.choice(np.arange(1, len(xml)), n_chunks - 1, False)
        )
    bounds = [0, *cuts, len(xml)]
    chunks = [xml[a:b] for a, b in zip(bounds, bounds[1:])]
    media_slots = sorted(int(s) for s in rng.integers(0, len(chunks) + 1, n_media))

    spans: list[dict] = []
    mi = 0
    mslot = 0
    for ci, chunk in enumerate(chunks):
        while mslot < len(media_slots) and media_slots[mslot] == ci:
            spans.append(
                {
                    "kind": spec.KIND_MEDIA,
                    "text": "",
                    "media_ref": f"img://{doc_id}/{mi}",
                    "offset": len(spans),
                }
            )
            mi += 1
            mslot += 1
        spans.append(
            {"kind": dialect, "text": chunk, "media_ref": "", "offset": len(spans)}
        )
    while mslot < len(media_slots):
        spans.append(
            {
                "kind": spec.KIND_MEDIA,
                "text": "",
                "media_ref": f"img://{doc_id}/{mi}",
                "offset": len(spans),
            }
        )
        mi += 1
        mslot += 1
    return spans


PROFILES = (
    "single_col",
    "two_col",
    "font_split",
    "gap_split",
    "tabular",
    "fullwidth_header",
    "media",
    "mega",
    "corrupt",
    "random",
    # appended (never reordered): doc ids of earlier profiles — and so
    # the committed goldens for them — are insertion-order-stable
    "three_col",
)


def make_doc(doc_id: str, seed: int = 42, profile: str = "random") -> dict:
    """Deterministically build one span-document.  Pure in (doc_id, seed,
    profile)."""
    rng = _doc_rng(doc_id, seed)

    dialect = spec.KIND_TETML if rng.random() < 0.5 else spec.KIND_PDFMINER
    n_pages = int(rng.integers(1, 4))
    two_col = bool(rng.random() < 0.3)
    n_blocks = int(rng.integers(1, 5))
    fonts = [FONTS[0], FONTS[1], FONTS[2]]
    tabular = bool(rng.random() < 0.25)
    header = two_col
    n_media = int(rng.integers(0, 4))
    n_chunks = int(rng.integers(1, 9))
    corrupt = False
    three_col = False

    if profile == "single_col":
        two_col, header, tabular, n_media = False, False, False, 0
    elif profile == "three_col":
        two_col, header, tabular = False, False, False
        three_col = True
    elif profile == "two_col":
        two_col, header, tabular = True, False, False
    elif profile == "fullwidth_header":
        two_col, header, tabular = True, True, False
    elif profile == "font_split":
        two_col, tabular, n_blocks = False, False, 4
    elif profile == "gap_split":
        two_col, tabular, n_blocks = False, False, 3
    elif profile == "tabular":
        two_col, tabular, n_blocks = False, True, 2
    elif profile == "media":
        n_media = max(1, n_media)
    elif profile == "mega":
        n_pages, n_chunks, two_col = 12, 48, False
    elif profile == "corrupt":
        corrupt = True

    pages = [
        _gen_page_words(
            rng, two_col, n_blocks, fonts, tabular, header, three_column=three_col
        )
        for _ in range(n_pages)
    ]
    xml = (
        _render_tetml(pages, rng)
        if dialect == spec.KIND_TETML
        else _render_pdfminer(pages, rng)
    )
    if corrupt:
        xml = xml[: max(10, len(xml) - 40)]  # truncated tag -> quarantine

    return {
        "doc_id": doc_id,
        "spans": _chunk_and_interleave(xml, dialect, doc_id, rng, n_media, n_chunks),
    }


def fixture_matrix(seed: int = 42) -> list[dict]:
    """The named fixture matrix (FIXTURES.md §3), both dialects via the
    per-doc dialect draw (doc ids chosen so both appear)."""
    docs = []
    for profile in PROFILES:
        for rep in range(4):  # 4 reps per profile -> both dialects appear
            docs.append(make_doc(f"fx-{profile}-{rep:02d}", seed, profile))
    return docs


def random_docs(n: int, seed: int = 42, prefix: str = "doc") -> list[dict]:
    """n random-profile docs with ~1% corrupt and a few mega docs."""
    docs = []
    for i in range(n):
        if n >= 50 and i % 97 == 13:
            profile = "corrupt"
        elif n >= 50 and i % 211 == 7:
            profile = "mega"
        else:
            profile = "random"
        docs.append(make_doc(f"{prefix}-{i:07d}", seed, profile))
    return docs

# --------------------------------------------------------------------------
# HTML dialect fixtures (HtmlSpec v1, freki_spark/html_spec.py)
# --------------------------------------------------------------------------


def _sentence(rng: np.random.Generator, lo: int = 6, hi: int = 26) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(str(_WORDS[int(i)]) for i in rng.integers(0, len(_WORDS), n))


def _link_bar(rng: np.random.Generator, n: int = 4) -> str:
    links = " ".join(
        f'<a href="/{_WORDS[int(w)]}">{_WORDS[int(w)].title()}</a>'
        for w in rng.integers(0, len(_WORDS), n)
    )
    return links


HTML_PROFILES = (
    "article",
    "linkfarm",
    "pre_code",
    "br_lines",
    "img_media",
    "entities",
    "messy",
    "boilerplate_only",
    "mega_html",
    "random_html",
)


def _gen_article_html(rng: np.random.Generator, profile: str) -> str:
    """One seeded HTML page exercising every S-H2..S-H5 path."""
    parts: list[str] = ['<!DOCTYPE html>\n<html>\n<head><title>']
    parts.append(_sentence(rng, 2, 5))
    parts.append("</title><style>p { color: red } /* <p>not content</p> */</style>")
    parts.append('<script>var page = "<div>nope</div>";</script></head>\n<body>\n')
    parts.append(f"<header><h1>{_sentence(rng, 2, 6)}</h1>{_link_bar(rng)}</header>\n")
    parts.append(f"<nav><ul><li>{_link_bar(rng, 2)}</li><li>{_link_bar(rng, 2)}</li></ul></nav>\n")

    n_paras = 20 if profile == "mega_html" else int(rng.integers(2, 6))
    parts.append("<main>\n")
    parts.append(f"<h2>{_sentence(rng, 2, 6)}</h2>\n")
    for i in range(n_paras):
        if profile == "linkfarm" and i % 2 == 0:
            parts.append(f"<p>{_link_bar(rng, 6)}</p>\n")  # linky -> dropped
        elif profile == "pre_code" and i == 1:
            code = "\n".join(
                f"    {_WORDS[int(w)]}({int(rng.integers(0, 99))});"
                for w in rng.integers(0, len(_WORDS), 4)
            )
            parts.append(f"<pre>\n{code}\n</pre>\n")
        elif profile == "br_lines" and i == 0:
            parts.append(
                f"<p>{_sentence(rng)}<br>{_sentence(rng)}<br><br>{_sentence(rng)}</p>\n"
            )
        elif profile == "entities" and i == 0:
            parts.append(
                f"<p>{_sentence(rng)} &amp; caf&#233; r&eacute;sum&#xE9; "
                f"&unknown; {_sentence(rng)}</p>\n"
            )
        elif profile == "img_media" and i == 1:
            parts.append(
                f'<figure><img src="img://{int(rng.integers(0, 999))}.png" '
                f'alt="{_sentence(rng, 2, 5)}"><figcaption>{_sentence(rng)}'
                f"</figcaption></figure>\n"
                f'<video src="vid://{int(rng.integers(0, 999))}.mp4">'
                f'<source src="vid://alt.webm"></video>\n'
            )
        else:
            em = f" <em>{_sentence(rng, 1, 3)}</em> " if rng.random() < 0.3 else " "
            parts.append(f"<p>{_sentence(rng)}{em}{_sentence(rng, 3, 9)}</p>\n")
        if rng.random() < 0.2:
            parts.append(f"<p>{_sentence(rng, 1, 4)}</p>\n")  # short -> dropped
    parts.append("</main>\n")
    parts.append(f"<aside>{_sentence(rng)} {_link_bar(rng)}</aside>\n")
    parts.append(f"<footer>{_link_bar(rng, 3)} &copy; {_sentence(rng, 1, 3)}</footer>\n")
    parts.append("</body>\n</html>\n")
    html = "".join(parts)

    if profile == "messy":
        # unclosed <p>, stray close tags, uppercase tags, nested p,
        # button inside p, valueless/duplicate attrs -- all tolerated.
        # Mutate only AFTER <body>: the head's <style> block contains
        # literal '<p>' text, and mutating that (as an earlier version
        # did) exercises nothing — the CDATA content is inert.
        b = html.index("<body>")
        head, body = html[:b], html[b:]
        body = body.replace("<p>", "<P>", 1)
        body = body.replace("</p>", "", 1)
        html = head + body
        i = html.find("</main>")
        html = (
            html[:i]
            + f"<p>{_sentence(rng)}<p>{_sentence(rng)} "
            + f"<button>ok</button> {_sentence(rng, 3, 8)}</div>"
            + f'<img src alt="no source"><img src="dup://a" src="dup://b">'
            + html[i:]
        )
    if profile == "boilerplate_only":
        i, j = html.find("<main>"), html.find("</main>")
        html = html[:i] + html[j + len("</main>") :]
    return html


def make_html_doc(doc_id: str, seed: int = 42, profile: str = "random_html") -> dict:
    """Deterministically build one HTML span-document.  Pure in
    (doc_id, seed, profile); chunked + media-interleaved like the XML
    fixtures so the reassembly and anchor paths are exercised."""
    rng = _doc_rng(doc_id, seed)
    html = _gen_article_html(rng, profile)
    n_media = int(rng.integers(0, 4))
    if profile == "img_media":
        n_media = max(1, n_media)
    n_chunks = 12 if profile == "mega_html" else int(rng.integers(1, 9))
    return {
        "doc_id": doc_id,
        "spans": _chunk_and_interleave(
            html, spec.KIND_HTML, doc_id, rng, n_media, n_chunks
        ),
    }


def html_fixture_matrix(seed: int = 42) -> list[dict]:
    docs = []
    for profile in HTML_PROFILES:
        for rep in range(3):
            docs.append(make_html_doc(f"hx-{profile}-{rep:02d}", seed, profile))
    return docs
