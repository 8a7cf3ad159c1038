"""Single-node oracle for HtmlSpec v1 (freki_spark/html_spec.py).

Readable reference implementation: builds an explicit DOM tree with
stdlib ``html.parser.HTMLParser``, then walks it recursively carrying
(suppressed, boilerplate, link, pre) context.  The Spark-side
``freki_spark.html_kernel`` implements the same spec as a streaming
single pass with no tree; tests assert span-for-span equality between
the two on every fixture (SURVEY.md §5.2 item 1).

The upstream reference (pvk444/freki) contains no HTML handling [U];
the HTML half of the north rule ("HTML boilerplate strip ... DOM
heuristics", BASELINE.json) is specified by html_spec.py alone.
"""

from __future__ import annotations

from html.parser import HTMLParser

from . import html_spec as H
from . import spec

# --------------------------------------------------------------------------
# DOM tree
# --------------------------------------------------------------------------


class Node:
    __slots__ = ("tag", "attrs", "pos", "children")

    def __init__(self, tag: str, attrs: dict, pos: int):
        self.tag = tag
        self.attrs = attrs
        self.pos = pos
        self.children: list = []  # Node | Text


class Text:
    __slots__ = ("text", "pos", "is_br")

    def __init__(self, text: str, pos: int, is_br: bool = False):
        self.text = text
        self.pos = pos
        self.is_br = is_br


class _TreeBuilder(HTMLParser):
    """S-H2 stack semantics: push non-void start tags, pop-to-matching
    on end tags (implicitly closing anything above the match), ignore
    unmatched end tags."""

    def __init__(self, starts: list[int]):
        super().__init__(convert_charrefs=False)
        self._starts = starts
        self.root = Node("#root", {}, 0)
        self._open = [self.root]

    def _pos(self) -> int:
        return H.absolute_pos(self._starts, self.getpos())

    def _append(self, child) -> None:
        self._open[-1].children.append(child)

    def handle_starttag(self, tag, attrs):
        pos = self._pos()
        if tag == "br":
            self._append(Text(H.BR_SENTINEL, pos, is_br=True))
            return
        # HTML5 duplicate-attribute rule: first occurrence wins
        adict: dict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v
        node = Node(tag, adict, pos)
        self._append(node)
        if tag not in H.VOID_TAGS:
            self._open.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self._open) - 1, 0, -1):
            if self._open[i].tag == tag:
                del self._open[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data):
        if data:
            self._append(Text(data.replace("\x00", H.NUL_REPLACEMENT), self._pos()))

    def handle_entityref(self, name):
        self._append(Text(H.decode_entityref(name), self._pos()))

    def handle_charref(self, ref):
        self._append(Text(H.decode_charref(ref), self._pos()))

    # comments / declarations / PIs carry no content (S-H1)


def parse_tree(html_text: str) -> Node:
    builder = _TreeBuilder(H.line_start_offsets(html_text))
    builder.feed(html_text)
    builder.close()
    return builder.root


# --------------------------------------------------------------------------
# recursive walk -> records
# --------------------------------------------------------------------------


class _Piece:
    __slots__ = ("text", "in_link", "in_bp", "in_pre", "pos", "is_br")

    def __init__(self, text, in_link, in_bp, in_pre, pos, is_br):
        self.text = text
        self.in_link = in_link
        self.in_bp = in_bp
        self.in_pre = in_pre
        self.pos = pos
        self.is_br = is_br


class _Walker:
    def __init__(self):
        self.records: list[dict] = []  # {type: block|media, ...}
        self.buf: list[_Piece] = []
        self.buf_tag: str | None = None  # nearest block ancestor at 1st piece
        self.buf_pre = False

    # ---- buffer ----

    def add_piece(self, node: Text, ctx) -> None:
        suppressed, bp, link, pre, block_anc = ctx
        if suppressed:
            return
        if not self.buf:
            self.buf_tag = block_anc
            self.buf_pre = pre > 0
        self.buf.append(
            _Piece(node.text, link > 0, bp > 0, pre > 0, node.pos, node.is_br)
        )

    def flush(self) -> None:
        if not self.buf:
            return
        pieces, self.buf = self.buf, []
        tag = self.buf_tag or "body"
        pre = self.buf_pre

        total = link = bp = 0
        for p in pieces:
            if p.is_br:
                continue  # the sentinel contributes no chars (S-H4)
            n = H.piece_chars(p.text)
            total += n
            if p.in_link:
                link += n
            if p.in_bp:
                bp += n

        raw = "".join(p.text for p in pieces)
        lines: list[str] = []
        for seg in raw.split(H.BR_SENTINEL):
            if pre:
                for ln in seg.split("\n"):
                    ln = ln.removesuffix("\r")
                    if ln.strip():
                        lines.append(ln)
            else:
                ln = H.collapse_ws(seg).strip(" ")
                if ln.strip():
                    lines.append(ln)
        if not lines:
            return

        ld = link / total if total else 0.0
        words = sum(H.word_count(ln) for ln in lines)
        if 2 * bp > total:
            return  # boilerplate-context majority (S-H4)
        if tag in H.HEADING_TAGS:
            keep = ld <= H.LINK_DENSITY_MAX
        elif pre:
            keep = True
        else:
            keep = words >= H.CONTENT_MIN_WORDS and ld <= H.LINK_DENSITY_MAX
        if keep:
            self.records.append(
                {
                    "type": "block",
                    "tag": tag,
                    "words": words,
                    "ld": ld,
                    "lines": lines,
                    "pos": pieces[0].pos,
                }
            )

    # ---- traversal ----

    def walk(self, node: Node, suppressed, bp, link, pre, block_anc) -> None:
        for child in node.children:
            if isinstance(child, Text):
                self.add_piece(child, (suppressed, bp, link, pre, block_anc))
                continue
            tag = child.tag
            if tag in H.MEDIA_TAGS:
                src = child.attrs.get("src") or ""
                if src and not suppressed and bp == 0:
                    self.flush()
                    self.records.append(
                        {
                            "type": "media",
                            "media_ref": src,
                            "text": child.attrs.get("alt") or "",
                            "pos": child.pos,
                        }
                    )
            is_block = tag in H.BLOCK_TAGS
            if is_block:
                self.flush()
            self.walk(
                child,
                suppressed or tag in H.STRIP_TAGS,
                bp + (tag in H.BOILERPLATE_TAGS),
                link + (tag == "a"),
                pre + (tag in H.PRE_TAGS),
                tag if is_block else block_anc,
            )
            if is_block:
                self.flush()


def analyze(html_text: str) -> list[dict]:
    """Parse + walk: ordered block/media records with source positions."""
    root = parse_tree(html_text)
    w = _Walker()
    w.walk(root, False, 0, 0, 0, "body")
    w.flush()
    return w.records


# --------------------------------------------------------------------------
# serialization (S-H6)
# --------------------------------------------------------------------------


def media_anchor_chars(html_chunks: list[dict], media_spans: list[dict]) -> list[int]:
    """Anchor char position for each input media span: total chars of
    html chunks whose input offset precedes it."""
    anchors = []
    for m in media_spans:
        before = 0
        for c in html_chunks:
            if c["offset"] > m["offset"]:
                break
            before += len(c["text"])
        anchors.append(before)
    return anchors


def serialize_records(
    doc_id: str, records: list[dict], media: list[dict], anchors: list[int]
) -> list[dict]:
    out: list[dict] = []

    def emit(kind: str, text: str, media_ref: str) -> None:
        out.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(out)}
        )

    mi = 0

    def drain_media(limit_pos: int | None) -> None:
        # emit media whose anchor precedes limit_pos (None = all):
        # combined with the call sites this realizes the S-H6 rule
        # "after the last record whose source position <= anchor".
        nonlocal mi
        while mi < len(media) and (limit_pos is None or anchors[mi] < limit_pos):
            emit(spec.KIND_MEDIA, media[mi]["text"], media[mi]["media_ref"])
            mi += 1

    drain_media(records[0]["pos"] if records else None)
    line_no = 0
    k = 0
    for i, rec in enumerate(records):
        nxt = records[i + 1]["pos"] if i + 1 < len(records) else None
        if rec["type"] == "block":
            k += 1
            start = line_no + 1
            end = line_no + len(rec["lines"])
            emit(
                spec.KIND_BLOCK,
                H.render_block_header(
                    doc_id, k, rec["tag"], rec["words"], rec["ld"], start, end
                ),
                "",
            )
            for ln in rec["lines"]:
                line_no += 1
                emit(spec.KIND_LINE, H.render_line(line_no, rec["tag"], ln), "")
        else:
            emit(spec.KIND_MEDIA, rec["text"], rec["media_ref"])
        drain_media(nxt)
    drain_media(None)
    return out


def extract_document(doc_id: str, spans: list[dict]) -> tuple[list[dict], str | None]:
    """HtmlSpec v1 pipeline for one document: reassemble kind='html'
    chunks, strip boilerplate, emit ordered output spans.  Input media
    spans are re-anchored; before-everything media leads the output.
    Never raises (quarantine path returns ([], error))."""
    spans = sorted(spans, key=lambda s: s["offset"])
    chunks = [s for s in spans if s["kind"] == spec.KIND_HTML]
    media = [s for s in spans if s["kind"] == spec.KIND_MEDIA]
    html_text = "".join(c["text"] for c in chunks)
    try:
        records = analyze(html_text)
    except Exception as e:  # tolerant parser; belt and braces (S-H1)
        return [], f"html-parse-error: {e}"
    anchors = media_anchor_chars(chunks, media)
    return serialize_records(doc_id, records, media, anchors), None
