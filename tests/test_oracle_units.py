"""Unit tests for the FrekiSpec v1 layout kernels (oracle side) with
hand-built token arrays (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

from freki_spark import spec
from freki_spark.oracle import (
    Line,
    Token,
    cluster_lines,
    detect_columns,
    extract_document,
    parse_pdfminer,
    parse_tetml,
    render_spacing,
    segment_blocks,
)


def tok(text, llx, lly, urx, ury, font="F0", size=12.0):
    return Token(text, llx, lly, urx, ury, font, size)


# ---- S1 parse --------------------------------------------------------------


def test_parse_tetml_word_and_majority_font():
    xml = (
        "<TET><Document><Pages>"
        '<Page number="1" width="612" height="792"><Content>'
        '<Word><Text>Hi</Text><Box llx="72" lly="700" urx="85" ury="712"/>'
        '<Glyph font="A" size="12.0">H</Glyph>'
        '<Glyph font="B" size="9.0">i</Glyph>'
        '<Glyph font="A" size="12.0">!</Glyph></Word>'
        "<Word><Text>  </Text>"
        '<Box llx="90" lly="700" urx="95" ury="712"/></Word>'
        "</Content></Page></Pages></Document></TET>"
    )
    pages = parse_tetml(xml)
    assert len(pages) == 1
    assert len(pages[0].tokens) == 1  # whitespace word dropped
    t = pages[0].tokens[0]
    assert (t.text, t.font, t.size) == ("Hi", "A", 12.0)
    assert (t.llx, t.lly, t.urx, t.ury) == (72.0, 700.0, 85.0, 712.0)


def test_parse_pdfminer_word_merge():
    xml = (
        '<pages><page id="1" bbox="0,0,612,792"><textbox id="0">'
        '<textline bbox="72,700,140,712">'
        '<text font="T" bbox="72,700,78,712" size="12.0">H</text>'
        '<text font="T" bbox="78,700,84,712" size="12.0">i</text>'
        "<text> </text>"
        '<text font="T" bbox="96,700,102,712" size="12.0">y</text>'
        '<text font="T" bbox="102,700,108,712" size="12.0">o</text>'
        "<text> </text>"
        "</textline></textbox></page></pages>"
    )
    pages = parse_pdfminer(xml)
    toks = pages[0].tokens
    assert [t.text for t in toks] == ["Hi", "yo"]
    assert toks[0].urx == 84.0 and toks[1].llx == 96.0


# ---- S2 line clustering ----------------------------------------------------


def test_cluster_lines_two_lines_and_order():
    toks = [
        tok("b", 100, 700, 110, 712),
        tok("a", 72, 700, 82, 712),
        tok("c", 72, 680, 82, 692),
    ]
    lines = cluster_lines(toks)
    assert [[t.text for t in ln.tokens] for ln in lines] == [["a", "b"], ["c"]]


def test_cluster_lines_superscript_joins():
    # small raised glyph overlapping > 0.5 of its own height
    toks = [
        tok("word", 72, 700, 100, 712),
        tok("2", 101, 705.4, 105, 712.6, size=7.2),
        tok("next", 72, 680, 100, 692),
    ]
    lines = cluster_lines(toks)
    assert [t.text for t in lines[0].tokens] == ["word", "2"]
    assert [t.text for t in lines[1].tokens] == ["next"]


def test_cluster_lines_disjoint_intervals_split():
    toks = [tok("a", 72, 700, 82, 712), tok("b", 72, 688, 82, 699)]
    assert len(cluster_lines(toks)) == 2


# ---- S3 spacing ------------------------------------------------------------


def test_render_spacing_proportional():
    # cw = (10+10)/(2+2) = 5; gap 20 -> 4 spaces
    ln = Line([tok("ab", 72, 700, 82, 712), tok("cd", 102, 700, 112, 712)])
    assert render_spacing(ln) == "ab    cd"


def test_render_spacing_min_one_space():
    # gap 2.5, cw 5 -> round(0.5) = 0 (banker's) but > 0.35*cw -> 1 space
    ln = Line([tok("ab", 72, 700, 82, 712), tok("cd", 84.5, 700, 94.5, 712)])
    assert render_spacing(ln) == "ab cd"


def test_render_spacing_touching_tokens_no_space():
    ln = Line([tok("ab", 72, 700, 82, 712), tok("cd", 82.5, 700, 92.5, 712)])
    assert render_spacing(ln) == "abcd"


# ---- S4 columns ------------------------------------------------------------


def _two_col_lines(n=4, w=612.0):
    lines = []
    y = 712.0
    for i in range(n):
        lines.append(
            Line(
                [
                    tok("left", 72, y - 12, 150, y),
                    tok("col", 160, y - 12, 280, y),
                    tok("right", 330, y - 12, 420, y),
                    tok("col", 430, y - 12, 540, y),
                ]
            )
        )
        y -= 16.0
    return lines


def test_detect_columns_split_and_order():
    segs = detect_columns(_two_col_lines(), 612.0)
    assert len(segs) == 4  # headers, left, right, footers
    headers, left, right, footers = segs
    assert not headers and not footers
    assert all(ln.urx <= 310 for ln in left)
    assert all(ln.llx >= 310 for ln in right)
    assert len(left) == 4 and len(right) == 4


def test_detect_columns_fullwidth_header_footer():
    lines = _two_col_lines(8)
    hdr = Line([tok("BigTitleAcrossTheWholePage", 72, 728, 540, 740)])
    ftr = Line([tok("footer-note-spanning-everything", 72, 60, 540, 72)])
    segs = detect_columns([hdr, *lines, ftr], 612.0)
    headers, left, right, footers = segs
    assert [t.text for t in headers[0].tokens][0].startswith("BigTitle")
    assert len(footers) == 1
    assert len(left) == 8 and len(right) == 8


def _three_col_lines(n=4):
    # channels ~(190, 240) and ~(360, 408): centers in the central band
    lines = []
    y = 712.0
    for i in range(n):
        lines.append(
            Line(
                [
                    tok("colA", 72, y - 12, 130, y),
                    tok("txt", 140, y - 12, 190, y),
                    tok("colB", 240, y - 12, 300, y),
                    tok("txt", 308, y - 12, 360, y),
                    tok("colC", 408, y - 12, 470, y),
                    tok("txt", 478, y - 12, 540, y),
                ]
            )
        )
        y -= 16.0
    return lines


def test_detect_columns_three_columns_and_order():
    segs = detect_columns(_three_col_lines(), 612.0)
    assert len(segs) == 5  # headers, colA, colB, colC, footers
    headers, a, b, c, footers = segs
    assert not headers and not footers
    assert len(a) == len(b) == len(c) == 4
    assert all(ln.urx <= 215 for ln in a)
    assert all(215 <= ln.llx and ln.urx <= 384 for ln in b)
    assert all(ln.llx >= 384 for ln in c)


def test_detect_columns_tab_grid_stays_single_column():
    # a page made of aligned tab rows: wide gaps at ~(106,142),
    # (176,212), (246,282) — the third tab gap's center (~124) is an
    # uncovered wide gap outside the proposed channels, so the v2
    # tab-grid guard keeps the page single-column
    lines = []
    y = 712.0
    for i in range(4):
        lines.append(
            Line(
                [
                    tok("cell", 72, y - 12, 106, y),
                    tok("cell", 142, y - 12, 176, y),
                    tok("cell", 212, y - 12, 246, y),
                    tok("cell", 282, y - 12, 316, y),
                ]
            )
        )
        y -= 16.0
    assert len(detect_columns(lines, 612.0)) == 1


def test_detect_columns_single_column_no_channel():
    lines = [
        Line([tok("aaaa", 72, 712 - 16 * i - 12, 540, 712 - 16 * i)])
        for i in range(5)
    ]
    assert len(detect_columns(lines, 612.0)) == 1


def test_detect_columns_offcenter_gap_ignored():
    # wide gap near the left margin: not in the central 40%
    lines = [
        Line(
            [
                tok("x", 72, 700 - 16 * i, 80, 712 - 16 * i),
                tok("y", 130, 700 - 16 * i, 540, 712 - 16 * i),
            ]
        )
        for i in range(4)
    ]
    assert len(detect_columns(lines, 612.0)) == 1


# ---- S5 blocks -------------------------------------------------------------


def test_segment_blocks_gap_split():
    def line_at(y, font="F0"):
        return Line([tok("w", 72, y - 12, 540, y, font=font)])

    # gaps: 4,4,40,4 -> median positive gap 4 -> 40 > 1.8*4 splits
    seg = [line_at(712), line_at(696), line_at(680), line_at(628), line_at(612)]
    blocks = segment_blocks([seg])
    assert [len(b.lines) for b in blocks] == [3, 2]


def test_segment_blocks_font_split():
    def line_at(y, font):
        return Line([tok("w", 72, y - 12, 540, y, font=font)])

    seg = [line_at(712, "A"), line_at(696, "A"), line_at(680, "B")]
    blocks = segment_blocks([seg])
    assert [len(b.lines) for b in blocks] == [2, 1]
    assert blocks[1].lines[0].tokens[0].font == "B"


# ---- S6 media anchoring / quarantine ---------------------------------------


def _tiny_tetml(n_pages=2):
    parts = ["<TET><Document><Pages>"]
    for p in range(1, n_pages + 1):
        parts.append(
            f'<Page number="{p}" width="612" height="792"><Content>'
            f'<Word><Text>p{p}</Text><Box llx="72" lly="700" urx="90" ury="712"/>'
            f'<Glyph font="F0" size="12.0">p</Glyph></Word></Content></Page>'
        )
    parts.append("</Pages></Document></TET>")
    return "".join(parts)


def test_media_anchored_to_page():
    xml = _tiny_tetml(2)
    # split xml at a point inside page 2's region
    cut = xml.index('number="2"') + 20
    spans = [
        {"kind": "tetml", "text": xml[:cut], "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "img://d/0", "offset": 1},
        {"kind": "tetml", "text": xml[cut:], "media_ref": "", "offset": 2},
    ]
    out, err = extract_document("d", spans)
    assert err is None
    kinds = [s["kind"] for s in out]
    # media lands after page 2's content (anchor char falls in page 2)
    assert kinds == ["block", "line", "block", "line", "media"]
    assert [s["offset"] for s in out] == list(range(5))


def test_media_before_everything():
    xml = _tiny_tetml(1)
    spans = [
        {"kind": "media", "text": "", "media_ref": "img://d/0", "offset": 0},
        {"kind": "tetml", "text": xml, "media_ref": "", "offset": 1},
    ]
    out, _ = extract_document("d", spans)
    assert [s["kind"] for s in out] == ["media", "block", "line"]


def test_corrupt_xml_quarantined():
    spans = [{"kind": "tetml", "text": "<TET><Docu", "media_ref": "", "offset": 0}]
    out, err = extract_document("d", spans)
    assert out == [] and err is not None and "error" in err


def test_media_only_doc():
    spans = [
        {"kind": "media", "text": "", "media_ref": "img://d/1", "offset": 5},
        {"kind": "media", "text": "", "media_ref": "img://d/0", "offset": 2},
    ]
    out, err = extract_document("d", spans)
    assert err is None
    assert [s["media_ref"] for s in out] == ["img://d/0", "img://d/1"]
