"""Vectorized numpy kernel for FrekiSpec v1 — the implementation that
runs inside the Spark pandas UDFs (``freki_spark.pipeline``).

Coded independently from ``freki_spark.oracle`` (two-implementation
consistency check, SURVEY.md §5.2): both share only ``spec`` constants
and the ``grammar`` output format.  All per-token math is float64
numpy; the only Python-level loops are the inherently-sequential
greedy scans (line clustering, block walking) over per-page arrays —
XML parsing (stdlib iterparse; no lxml offline) dominates runtime
regardless.

The kernel has two entry surfaces:

- ``extract_document_rows`` — whole document in, final output span
  rows out (the unsalted fast path; one call per input row inside
  ``mapInPandas`` / ``applyInPandas``).
- ``split_pages`` + ``extract_group_records`` — the salted mega-doc
  path (S7): stage 1 splits raw XML into per-page pieces by regex,
  stage 2 lays out each page shard and emits *structured* span records
  with group-local numbering; global renumbering happens back in Spark
  (see pipeline.py).

Reference parity targets (pvk444/freki [U], mount empty at build time):
freki/analyzers/{tetml,pdfminer}.py (S1), analyzers/base.py (S2/S3),
freki/main.py block logic (S4/S5), freki/serialize.py (S6).
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET

import numpy as np

from . import fastparse, spec
from .grammar import (
    font_key,
    font_label,
    mode_first,
    render_bbox,
    render_block_header_from_parts,
    render_line,
)

# --------------------------------------------------------------------------
# token batch: parallel arrays for one page
# --------------------------------------------------------------------------


class PageTokens:
    __slots__ = ("number", "width", "height", "texts", "fkeys", "box")

    def __init__(self, number: int, width: float, height: float):
        self.number = number
        self.width = width
        self.height = height
        self.texts: list[str] = []
        self.fkeys: list[str] = []
        self.box: np.ndarray | list = []  # grows as python list of 4-tuples

    def add(self, text: str, llx: float, lly: float, urx: float, ury: float, fk: str):
        self.texts.append(text)
        self.fkeys.append(fk)
        self.box.append((llx, lly, urx, ury))

    def freeze(self) -> None:
        self.box = np.asarray(self.box, dtype=np.float64).reshape(-1, 4)


def _strip_ns(tag: str) -> str:
    i = tag.rfind("}")
    return tag[i + 1 :] if i >= 0 else tag


# S1 majority-font tie-break — shared with fastparse via grammar (the
# two parser paths must vote identically)
_mode_first = mode_first


# --------------------------------------------------------------------------
# S1 — parse (streaming iterparse, memory-bounded for mega pages)
# --------------------------------------------------------------------------


def parse_tetml(xml_text: str) -> list[PageTokens]:
    """Guarded regex/numpy fast path (fastparse.py) with ET fallback:
    the fast parser validates with the same expat C parser ET wraps
    (identical accept/reject + error text) and bails to the ET walk on
    any construct a flat regex scan can't mirror."""
    pages = fastparse.parse_tetml_fast(xml_text, PageTokens)
    return pages if pages is not None else _parse_tetml_et(xml_text)


def parse_pdfminer(xml_text: str) -> list[PageTokens]:
    """Same guarded fast path for the PDFMiner dialect (vectorized:
    one findall per page + numpy reduceat word assembly)."""
    pages = fastparse.parse_pdfminer_fast(xml_text, PageTokens)
    return pages if pages is not None else _parse_pdfminer_et(xml_text)


def _parse_tetml_et(xml_text: str) -> list[PageTokens]:
    """fromstring + wildcard-namespace iter: tag matching stays in C
    (measured ~40% faster than the iterparse event loop on this shape);
    the single-node oracle keeps an independent traversal."""
    root = ET.fromstring(xml_text)
    pages: list[PageTokens] = []
    fk_memo: dict[tuple[str, str], str] = {}
    for pel in root.iterfind(".//{*}Page"):
        cur = PageTokens(
            int(pel.get("number", str(len(pages) + 1))),
            float(pel.get("width", "612")),
            float(pel.get("height", "792")),
        )
        for wel in pel.iterfind(".//{*}Word"):
            text = None
            box = None
            gfonts: list[str] = []
            for ch in wel:
                cn = _strip_ns(ch.tag)
                if cn == "Text":
                    text = ch.text
                elif cn == "Box":
                    box = (
                        float(ch.get("llx")),
                        float(ch.get("lly")),
                        float(ch.get("urx")),
                        float(ch.get("ury")),
                    )
                elif cn == "Glyph":
                    raw = (ch.get("font", ""), ch.get("size", "0"))
                    fk = fk_memo.get(raw)
                    if fk is None:
                        fk = font_key(raw[0], float(raw[1]))
                        fk_memo[raw] = fk
                    gfonts.append(fk)
            if text and text.strip() and box is not None:
                fk = gfonts[_mode_first(gfonts)] if gfonts else font_key("", 0.0)
                cur.add(text, *box, fk)
        cur.freeze()
        pages.append(cur)
    return pages


def _parse_pdfminer_et(xml_text: str) -> list[PageTokens]:
    root = ET.fromstring(xml_text)
    pages: list[PageTokens] = []
    fk_memo: dict[tuple[str, str], str] = {}
    for pel in root.iterfind(".//{*}page"):
        pb = pel.get("bbox", "0,0,612,792").split(",")
        cur = PageTokens(
            int(pel.get("id", str(len(pages) + 1))),
            float(pb[2]) - float(pb[0]),
            float(pb[3]) - float(pb[1]),
        )
        wtext: list[str] = []
        wbox: list[tuple[float, float, float, float]] = []
        wfk: list[str] = []

        def flush() -> None:
            if wtext:
                # python min/max over the handful of glyph boxes (exact,
                # same floats as numpy; ~10x cheaper at this size)
                cur.add(
                    "".join(wtext),
                    min(b[0] for b in wbox),
                    min(b[1] for b in wbox),
                    max(b[2] for b in wbox),
                    max(b[3] for b in wbox),
                    wfk[_mode_first(wfk)],
                )
            wtext.clear()
            wbox.clear()
            wfk.clear()

        for tl in pel.iterfind(".//{*}textline"):
            for gel in tl.iterfind(".//{*}text"):
                gtext, gbbox = gel.text, gel.get("bbox")
                if gtext is None or not gtext.strip() or gbbox is None:
                    flush()
                    continue
                wtext.append(gtext)
                b = gbbox.split(",")
                wbox.append((float(b[0]), float(b[1]), float(b[2]), float(b[3])))
                raw = (gel.get("font", ""), gel.get("size", "0"))
                fk = fk_memo.get(raw)
                if fk is None:
                    fk = font_key(raw[0], float(raw[1]))
                    fk_memo[raw] = fk
                wfk.append(fk)
            flush()
        cur.freeze()
        pages.append(cur)
    return pages


_PARSERS = {spec.KIND_TETML: parse_tetml, spec.KIND_PDFMINER: parse_pdfminer}


# --------------------------------------------------------------------------
# S2 — line clustering (greedy over y-sorted token indices)
# --------------------------------------------------------------------------


def cluster_lines(page: PageTokens) -> list[np.ndarray]:
    """Return token-index arrays, one per line, reading order applied:
    within line by llx; lines by descending mean ury."""
    n = len(page.texts)
    if n == 0:
        return []
    box = page.box
    order = np.lexsort((np.arange(n), box[:, 0], -box[:, 3]))
    # python-float locals for the greedy scan: identical IEEE compares,
    # ~3x cheaper than numpy scalar indexing in this per-token loop
    heights = (box[:, 3] - box[:, 1]).tolist()
    llys = box[:, 1].tolist()
    urys = box[:, 3].tolist()
    ratio = spec.LINE_OVERLAP_RATIO
    lines: list[list[int]] = []
    cur_lly = cur_ury = 0.0
    for i in order.tolist():
        if lines:
            yi0, yi1 = llys[i], urys[i]
            overlap = min(yi1, cur_ury) - max(yi0, cur_lly)
            if overlap > ratio * min(heights[i], cur_ury - cur_lly):
                lines[-1].append(i)
                if yi0 < cur_lly:
                    cur_lly = yi0
                if yi1 > cur_ury:
                    cur_ury = yi1
                continue
        lines.append([i])
        cur_lly, cur_ury = llys[i], urys[i]
    out: list[np.ndarray] = []
    for idx in lines:
        # stable sort by llx over insertion order — mirrors the
        # oracle's python list.sort(key=llx) tie-break exactly
        a = np.asarray(idx, dtype=np.int64)
        a = a[np.argsort(box[a, 0], kind="stable")]
        out.append(a)
    # add.reduce/n is np.mean's own computation (pairwise sum, one
    # divide) without the fromnumeric dispatch — bit-identical on
    # float64 1-d input and ~3x faster at line-sized arrays (the
    # goldens and kernel-parity tests pin the bit-identity)
    mean_ury = np.asarray(
        [float(np.add.reduce(box[a, 3]) / a.shape[0]) for a in out]
    )
    return [out[j] for j in np.argsort(-mean_ury, kind="stable")]


# --------------------------------------------------------------------------
# S3 — spacing (vectorized per line)
# --------------------------------------------------------------------------


def render_spacing(page: PageTokens, idx: np.ndarray) -> str:
    box = page.box[idx]
    texts = [page.texts[i] for i in idx]
    widths = box[:, 2] - box[:, 0]
    # integer char count: order-exact, no float-summation semantics
    # (cw itself keeps np.sum's pairwise order — the oracle pins it)
    total_c = sum(len(t) for t in texts)
    cw = float(np.sum(widths)) / total_c if total_c else 1.0
    if cw <= 0:
        cw = 1.0
    if len(texts) == 1:
        return texts[0]
    # scalar gap loop: lines are ~10 tokens, where numpy's per-call
    # constants cost more than the arithmetic (measured 1.4x).  Python
    # round() and np.rint are both round-half-even on float64, so the
    # elementwise math is identical; quotients beyond 2^53 (absurd
    # coordinates) fall back to the vector path whose astype semantics
    # the goldens pin.
    ratio = spec.SPACE_MIN_GAP_RATIO * cw
    lx = box[:, 0].tolist()
    rx = box[:, 2].tolist()
    parts = [texts[0]]
    for j in range(1, len(texts)):
        gap = lx[j] - rx[j - 1]
        q = gap / cw
        if not (-9.0e15 < q < 9.0e15):
            return _render_spacing_vec(box, texts, cw)
        k = int(round(q))
        if k < 0:
            k = 0
        if k < 1 and gap > ratio:
            k = 1
        parts.append(" " * k)
        parts.append(texts[j])
    return "".join(parts)


def _render_spacing_vec(box: np.ndarray, texts: list[str], cw: float) -> str:
    gaps = box[1:, 0] - box[:-1, 2]
    nsp = np.maximum(np.rint(gaps / cw), 0.0)
    nsp[(nsp < 1.0) & (gaps > spec.SPACE_MIN_GAP_RATIO * cw)] = 1.0
    parts = [texts[0]]
    for k, t in zip(nsp.astype(np.int64), texts[1:]):
        parts.append(" " * int(k))
        parts.append(t)
    return "".join(parts)


# --------------------------------------------------------------------------
# S4 — column detection (per-line whitespace-channel voting)
# --------------------------------------------------------------------------


def detect_columns(page: PageTokens, lines: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Spec S4: the v1 single split (pooled median of qualifying gap
    centers) is tried first — pages it accepts are bit-for-bit
    unchanged from v1 — then the v2 multi-split fallback (interval-
    overlap channel clustering, >= 3 columns) with the tab-grid
    guard."""
    if len(lines) < 2:
        return [lines]
    box = page.box
    w = page.width
    lo = w * (0.5 - spec.COLUMN_CENTER_FRAC / 2.0)
    hi = w * (0.5 + spec.COLUMN_CENTER_FRAC / 2.0)

    # all intra-line token gaps at once: tokens are already in
    # within-line x order, so consecutive-pair gaps per line are just
    # consecutive pairs of the concatenated index array, masked where
    # the pair crosses a line boundary.  Values and their order are
    # identical to the per-line construction.
    n_lines = len(lines)
    lens = np.fromiter((len(ix) for ix in lines), np.int64, count=n_lines)
    cat = np.concatenate(lines)
    ends = np.cumsum(lens)
    starts = ends - lens
    npairs = len(cat) - 1
    intra = np.ones(npairs, dtype=bool)
    intra[ends[:-1] - 1] = False  # pairs straddling a line boundary
    gs = box[cat[:-1], 2]
    ge = box[cat[1:], 0]
    lid = np.repeat(np.arange(n_lines), lens)[:-1]  # line id per pair
    pos = intra & (ge > gs)

    qual = pos & ((ge - gs) >= spec.COLUMN_MIN_CHANNEL_PT)
    c = (gs + ge) / 2.0
    sel = qual & (c >= lo) & (c <= hi)
    if not sel.any():
        return [lines]

    line_max_urx = np.maximum.reduceat(box[cat, 2], starts)
    line_min_llx = np.minimum.reduceat(box[cat, 0], starts)

    def try_splits(splits: list[float], strict: bool):
        sp = np.asarray(splits, dtype=np.float64)
        ns = len(splits)
        # contains[l, i]: line l holds a qualifying gap over split i
        contains = np.zeros((n_lines, ns), dtype=bool)
        for i in range(ns):
            cm = qual & (gs < sp[i]) & (sp[i] < ge)
            if cm.any():
                contains[np.unique(lid[cm]), i] = True
        spans = (line_min_llx[:, None] < sp[None, :]) & (
            sp[None, :] < line_max_urx[:, None]
        )
        compat = ~(spans & ~contains).any(axis=1)
        if int(compat.sum()) / n_lines < spec.COLUMN_MIN_LINE_FRAC:
            return None
        if strict:
            # tab-grid guard (spec S4 v2 rule c): most bridging lines
            # holding a wide gap that contains NO proposed split means
            # a tab grid, not columns
            unc_pair = qual.copy()
            for i in range(ns):
                unc_pair &= ~((gs < sp[i]) & (sp[i] < ge))
            unc_line = np.zeros(n_lines, dtype=bool)
            if unc_pair.any():
                unc_line[np.unique(lid[unc_pair])] = True
            bridging = compat & spans.any(axis=1)
            n_bridging = int(bridging.sum())
            if n_bridging and int((bridging & unc_line).sum()) * 2 > n_bridging:
                return None

        ncols = ns + 1
        cols: list[list[np.ndarray]] = [[] for _ in range(ncols)]
        full: list[np.ndarray] = []
        one_split = ns == 1
        for li, idx in enumerate(lines):
            if not compat[li]:
                full.append(idx)
                continue
            xc = (box[idx, 0] + box[idx, 2]) / 2.0
            # bin = number of splits <= xcenter; the 1-split common case
            # is a single vectorized compare (searchsorted on a 1-element
            # array costs ~2x per line)
            b = (
                (xc >= sp[0]).astype(np.intp)
                if one_split
                else np.searchsorted(sp, xc, side="right")
            )
            if b[0] == b[-1] and (b == b[0]).all():
                cols[int(b[0])].append(idx)  # whole line in one column
            else:
                for bi in np.unique(b):
                    cols[int(bi)].append(idx[b == bi])
        if any(not cl for cl in cols):
            return None

        body = [i for cl in cols for i in cl]
        body_top = max(float(box[i, 3].max()) for i in body)
        body_bot = min(float(box[i, 1].min()) for i in body)
        body_mid = (body_top + body_bot) / 2.0
        headers, footers = [], []
        for idx in full:
            yc = (float(box[idx, 1].min()) + float(box[idx, 3].max())) / 2.0
            (headers if yc >= body_mid else footers).append(idx)

        segs = []
        for seg in (headers, *cols, footers):
            if seg:
                # same bit-identical add.reduce/n as cluster_lines
                mu = np.asarray(
                    [float(np.add.reduce(box[i, 3]) / i.shape[0]) for i in seg]
                )
                seg = [seg[j] for j in np.argsort(-mu, kind="stable")]
            segs.append(seg)
        return segs

    mc = float(np.median(c[sel]))
    segs = try_splits([mc], strict=False)
    if segs is not None:
        return segs

    # v2 fallback: interval-overlap channel clustering of qualifying
    # gaps (sorted by (gs, ge) like the oracle; membership only depends
    # on gap starts vs the running max end)
    order = np.lexsort((ge[sel], gs[sel]))
    ggs, gge, gc = gs[sel][order], ge[sel][order], c[sel][order]
    channels: list[list[int]] = [[0]]
    max_ge = gge[0]
    for j in range(1, len(ggs)):
        if ggs[j] < max_ge:
            channels[-1].append(j)
            max_ge = max(max_ge, gge[j])
        else:
            channels.append([j])
            max_ge = gge[j]
    splits = [
        float(np.median(gc[ch]))
        for ch in channels
        if len(ch) >= spec.COLUMN_CHANNEL_MIN_GAPS
    ]
    if len(splits) >= 2:
        segs = try_splits(splits, strict=True)
        if segs is not None:
            return segs
    return [lines]


# --------------------------------------------------------------------------
# S5 — block segmentation
# --------------------------------------------------------------------------


def segment_blocks(
    page: PageTokens, segments: list[list[np.ndarray]]
) -> list[list[np.ndarray]]:
    """Group each segment's lines into blocks; returns blocks as lists
    of line index-arrays, page reading order preserved."""
    box = page.box

    def seg_minmax(seg: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        """Per-line (min lly, max ury) via one reduceat pair — exact
        (min/max are order-independent), no per-line numpy calls."""
        if not seg:
            return np.empty(0), np.empty(0)
        lens = np.fromiter((len(ix) for ix in seg), np.int64, count=len(seg))
        cat = np.concatenate(seg)
        starts = np.cumsum(lens) - lens
        return (
            np.minimum.reduceat(box[cat, 1], starts),
            np.maximum.reduceat(box[cat, 3], starts),
        )

    stats = [seg_minmax(seg) for seg in segments]
    lly = [s[0] for s in stats]
    ury = [s[1] for s in stats]
    all_gaps: list[np.ndarray] = []
    for a, b in zip(lly, ury):
        if len(a) > 1:
            g = a[:-1] - b[1:]
            all_gaps.append(g[g > 0])
    pos = np.concatenate(all_gaps) if all_gaps else np.empty(0)
    med = float(np.median(pos)) if len(pos) else None

    def dom_font(idx: np.ndarray) -> str:
        keys = [page.fkeys[i] for i in idx]
        return keys[_mode_first(keys)]

    blocks: list[list[np.ndarray]] = []
    for si, seg in enumerate(segments):
        if not seg:
            continue
        cur = [seg[0]]
        bf = dom_font(seg[0])
        for j in range(1, len(seg)):
            g = lly[si][j - 1] - ury[si][j]
            lf = dom_font(seg[j])
            if (med is not None and g > spec.BLOCK_GAP_FACTOR * med) or lf != bf:
                blocks.append(cur)
                cur = [seg[j]]
                bf = lf
            else:
                cur.append(seg[j])
        blocks.append(cur)
    return blocks


# --------------------------------------------------------------------------
# structured span records (shared by unsalted finalize and salted stage 2)
# --------------------------------------------------------------------------


def layout_page(page: PageTokens, records: list, line_no: int, seq: int, doc_fonts):
    """Run S2–S5 on one page and append structured records.

    records: list of dicts with keys kind/page/block_k/line_start/
    line_end/line_no/fonts_keys/body/media_ref/seq (group-local
    numbering).  doc_fonts: ordered dict fkey -> None tracking first
    appearance (insertion order = (seq, within-line position)).
    Returns updated (line_no, seq).
    """
    lines = cluster_lines(page)
    segments = detect_columns(page, lines)
    blocks = segment_blocks(page, segments)
    box = page.box
    for k, blines in enumerate(blocks, start=1):
        allidx = np.concatenate(blines)
        bbox = render_bbox(
            float(box[allidx, 0].min()),
            float(box[allidx, 1].min()),
            float(box[allidx, 2].max()),
            float(box[allidx, 3].max()),
        )
        records.append(
            {
                "kind": spec.KIND_BLOCK,
                "page": page.number,
                "block_k": k,
                "line_start": line_no + 1,
                "line_end": line_no + len(blines),
                "line_no": 0,
                "fonts_keys": [],
                "body": bbox,
                "media_ref": "",
                "seq": seq,
            }
        )
        seq += 1
        for idx in blines:
            line_no += 1
            fkeys: list[str] = []
            seen: set[str] = set()
            for i in idx:
                fk = page.fkeys[i]
                if fk not in seen:
                    seen.add(fk)
                    fkeys.append(fk)
                if fk not in doc_fonts:
                    doc_fonts[fk] = (seq, len(fkeys) - 1)
            records.append(
                {
                    "kind": spec.KIND_LINE,
                    "page": page.number,
                    "block_k": k,
                    "line_start": 0,
                    "line_end": 0,
                    "line_no": line_no,
                    "fonts_keys": fkeys,
                    "body": render_spacing(page, idx),
                    "media_ref": "",
                    "seq": seq,
                }
            )
            seq += 1
    return line_no, seq


def finalize_records(doc_id: str, records: list, doc_fonts: dict) -> list[dict]:
    """Render structured records into final (kind,text,media_ref,offset)
    spans — the unsalted path's serializer (global numbering is already
    group-local == doc-local here)."""
    fid = {fk: i for i, fk in enumerate(doc_fonts)}
    out = []
    for off, r in enumerate(records):
        if r["kind"] == spec.KIND_LINE:
            labels = [font_label(fid[fk], fk) for fk in r["fonts_keys"]]
            text = render_line(r["line_no"], labels, r["body"])
        elif r["kind"] == spec.KIND_BLOCK:
            text = render_block_header_from_parts(
                doc_id,
                r["page"],
                r["block_k"],
                r["body"],
                r["line_start"],
                r["line_end"],
            )
        else:  # media
            text = r["body"]
        out.append(
            {
                "kind": r["kind"],
                "text": text,
                "media_ref": r["media_ref"],
                "offset": off,
            }
        )
    return out


# --------------------------------------------------------------------------
# media anchoring (page position per media span)
# --------------------------------------------------------------------------

PAGE_START_RE = spec.PAGE_START_RE  # normative, shared with the oracle


def media_page_positions(
    chunk_offsets: list[int],
    chunk_lens: list[int],
    page_starts: list[int],
    media_offsets: list[int],
) -> list[int]:
    """0-based page position for each media span (-1 = prologue)."""
    cum = np.concatenate([[0], np.cumsum(chunk_lens)])
    res = []
    for mo in media_offsets:
        j = int(np.searchsorted(np.asarray(chunk_offsets), mo))
        anchor = int(cum[j])
        res.append(int(np.searchsorted(np.asarray(page_starts), anchor, "right")) - 1)
    return res


# --------------------------------------------------------------------------
# top level — unsalted fast path
# --------------------------------------------------------------------------


def extract_document_rows(
    doc_id: str, spans: list[dict]
) -> tuple[list[dict], str | None]:
    """Whole-document extraction; mirrors oracle.extract_document but
    array-based.  Returns (output_spans, error).

    Dialect dispatch: the first input chunk's kind decides the
    pipeline — kind='html' routes to the HtmlSpec main-content
    extractor (freki_spark.html_kernel); the XML kinds run FrekiSpec
    S1-S7 below (stray other-kind chunks are ignored by the chosen
    pipeline)."""
    spans = sorted(spans, key=lambda s: s["offset"])
    first_kind = next(
        (s["kind"] for s in spans if s["kind"] in spec.CHUNK_KINDS), None
    )
    if first_kind == spec.KIND_HTML:
        from . import html_kernel

        return html_kernel.extract_document_rows(doc_id, spans)
    chunks = [s for s in spans if s["kind"] in spec.XML_KINDS]
    media = [s for s in spans if s["kind"] == spec.KIND_MEDIA]

    if not chunks:
        return (
            [
                {
                    "kind": spec.KIND_MEDIA,
                    "text": m["text"],
                    "media_ref": m["media_ref"],
                    "offset": i,
                }
                for i, m in enumerate(media)
            ],
            None,
        )

    dialect = chunks[0]["kind"]
    xml = "".join(c["text"] for c in chunks)
    try:
        pages = _PARSERS[dialect](xml)
    except ET.ParseError as e:
        return [], f"xml-parse-error: {e}"
    except (ValueError, TypeError, IndexError) as e:
        return [], f"xml-content-error: {e}"

    starts = [m.start() for m in PAGE_START_RE[dialect].finditer(xml)]
    mpos = media_page_positions(
        [c["offset"] for c in chunks],
        [len(c["text"]) for c in chunks],
        starts,
        [m["offset"] for m in media],
    )
    media_by_page: dict[int, list[dict]] = {}
    for m, p in zip(media, mpos):
        # clamp to parsed pages (mirrors oracle.extract_document): regex
        # anchor sites inside comments/PIs can exceed what the parser
        # yields; media spans must never vanish
        media_by_page.setdefault(min(p, len(pages) - 1), []).append(m)

    records: list[dict] = []
    doc_fonts: dict[str, tuple[int, int]] = {}
    line_no = seq = 0
    for m in media_by_page.get(-1, []):
        records.append(
            {
                "kind": spec.KIND_MEDIA,
                "page": 0,
                "block_k": 0,
                "line_start": 0,
                "line_end": 0,
                "line_no": 0,
                "fonts_keys": [],
                "body": m["text"],
                "media_ref": m["media_ref"],
                "seq": seq,
            }
        )
        seq += 1
    for pidx, page in enumerate(pages):
        line_no, seq = layout_page(page, records, line_no, seq, doc_fonts)
        for m in media_by_page.get(pidx, []):
            records.append(
                {
                    "kind": spec.KIND_MEDIA,
                    "page": page.number,
                    "block_k": 0,
                    "line_start": 0,
                    "line_end": 0,
                    "line_no": 0,
                    "fonts_keys": [],
                    "body": m["text"],
                    "media_ref": m["media_ref"],
                    "seq": seq,
                }
            )
            seq += 1
    return finalize_records(doc_id, records, doc_fonts), None


# --------------------------------------------------------------------------
# salted mega-doc path (S7)
# --------------------------------------------------------------------------


def split_pages(xml: str, dialect: str) -> tuple[list[str], list[int]]:
    """Regex-split raw XML into standalone per-page pieces (stage 1).

    Returns (pieces, page_starts).  Each piece is made standalone at
    stage 1 via repair_page_piece (which needs the preamble's xmlns
    declarations — only stage 1 sees the whole document).  Assumes page elements do not nest
    and no entity definitions live in the prologue (true for both
    supported dialects)."""
    starts = [m.start() for m in PAGE_START_RE[dialect].finditer(xml)]
    pieces = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(xml)
        pieces.append(xml[s:e])
    return pieces, starts


_XMLNS_RE = re.compile(r"""(xmlns(?::[\w.-]+)?)\s*=\s*("[^"]*"|'[^']*')""")


def collect_xmlns(preamble: str) -> str:
    """Namespace declarations from the document preamble (the ancestor
    tags before the first page element), deduped by prefix with the
    last (innermost) binding winning — re-declared on the standalone
    wrapper so prefixed page content parses outside its original root.
    Returns '' or a leading-space attr string."""
    seen: dict[str, str] = {}
    for m in _XMLNS_RE.finditer(preamble):
        seen[m.group(1)] = m.group(2)
    if not seen:
        return ""
    return "".join(f" {k}={v}" for k, v in seen.items())


def repair_page_piece(piece: str, dialect: str, decls: str = "") -> str:
    """Truncate after the page's close tag and wrap for standalone
    parse.  Handles all close forms the parsers accept: namespaced /
    whitespace-bearing end tags and self-closing page elements (a
    piece ending '<Page .../></TET>' must not drag the parent close
    tags into the wrapped parse).  ``decls`` re-binds the preamble's
    xmlns declarations on the wrapper (collect_xmlns)."""
    last = None
    for last in spec.PAGE_END_RE[dialect].finditer(piece):
        pass
    if last is not None:
        piece = piece[: last.end()]
    else:
        m = re.match(r"<[^>]*>", piece)
        if m is not None and m.group().rstrip().endswith("/>"):
            piece = piece[: m.end()]  # self-closing page, no close tag
    return f"<R{decls}>{piece}</R>"


def extract_group_records(
    doc_id: str,
    items: list[dict],
    dialect: str,
) -> tuple[list[dict], dict, int, int, str | None]:
    """Stage 2 of the salted path: lay out one salted page-group.

    items: [{'item_type': 'page'|'media', 'payload', 'media_ref',
    'page_pos', 'rank'}] sorted by (page_pos, rank).  Returns
    (records with group-local numbering, doc_fonts first-appearance
    dict, n_lines, n_spans, error)."""
    records: list[dict] = []
    doc_fonts: dict[str, tuple[int, int]] = {}
    line_no = seq = 0
    for it in items:
        if it["item_type"] == "media":
            records.append(
                {
                    "kind": spec.KIND_MEDIA,
                    "page": 0,
                    "block_k": 0,
                    "line_start": 0,
                    "line_end": 0,
                    "line_no": 0,
                    "fonts_keys": [],
                    "body": it["payload"],
                    "media_ref": it["media_ref"],
                    "seq": seq,
                }
            )
            seq += 1
            continue
        try:
            pages = _PARSERS[dialect](it["payload"])  # repaired in stage 1
        except ET.ParseError as e:
            return [], {}, 0, 0, f"xml-parse-error: {e}"
        except (ValueError, TypeError, IndexError) as e:
            return [], {}, 0, 0, f"xml-content-error: {e}"
        for page in pages:
            line_no, seq = layout_page(page, records, line_no, seq, doc_fonts)
    return records, doc_fonts, line_no, seq, None
