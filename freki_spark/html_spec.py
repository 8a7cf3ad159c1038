"""HtmlSpec v1 — main-content extraction over HTML documents.

The north rule (BASELINE.json ``north_rule``) names the pipeline as
"HTML boilerplate strip, PDF/layout parse, DOM heuristics".  The
PDF/layout half is FrekiSpec v1 (``freki_spark/spec.py``); this module
is the HTML half: the normative constants and micro-definitions for
stripping boilerplate from an HTML document and emitting the surviving
main content as the same ordered span model
``(kind, text, media_ref, offset)``.

Like ``spec.py``, this module is the single shared contract between two
deliberately separate implementations (SURVEY.md §5.2 item 1):

- ``freki_spark.html_oracle``  — readable single-node implementation
  that builds an explicit DOM tree and walks it recursively;
- ``freki_spark.html_kernel``  — the streaming single-pass
  implementation that runs inside the Spark Arrow UDFs (no tree).

Only constants, the output grammar, and tiny *normative* pure
functions (whitespace collapse, word count, entity decode, source
positions) live here — analysis logic is coded twice, never shared.

The reference (pvk444/freki) has no HTML path at all [U]; these
semantics are new engineering for the graft, designed after the
boilerpipe family of densometric classifiers (Kohlschütter et al.,
WSDM 2010: text density + link density decide content vs boilerplate)
plus explicit DOM-ancestor rules for the HTML5 sectioning tags.  Each
constant is an engineering default; all are centralized here so tuning
is a one-file diff.

Semantics (S-H1..S-H6, implemented twice):

S-H1 parse.  Reassemble ``kind='html'`` chunks in input-span offset
  order and parse with stdlib ``html.parser.HTMLParser``
  (``convert_charrefs=False`` so source positions stay exact; entities
  are decoded per piece via the normative helpers below).  HTML is
  never rejected for malformedness — the parser is tolerant by
  design; only an unexpected parser exception quarantines
  (``html-parse-error: ...``).  NUL bytes in text data are replaced
  with U+FFFD (the WHATWG rule), freeing ``\\x00`` as the internal
  <br> line-break sentinel.

S-H2 element stack.  Tag names are lowercased (HTMLParser does this).
  A start tag pushes unless the tag is void (VOID_TAGS); an end tag
  pops to the nearest matching open tag, discarding anything above it;
  an unmatched end tag is ignored.  Content is *suppressed* while any
  open element is in STRIP_TAGS; it is in *boilerplate context* while
  any open element is in BOILERPLATE_TAGS; in *link context* inside
  ``<a>``; in *pre context* inside PRE_TAGS.

S-H3 block building.  Text data accumulates into the current block
  buffer as (piece, in_link, in_bp, in_pre, src_pos) tuples;
  suppressed data is discarded.  ``<br>`` appends the ``\\x00``
  sentinel.  The buffer flushes when: a BLOCK_TAGS start tag opens, a
  *matched* BLOCK_TAGS end tag closes, a media tag is emitted (S-H5),
  or the document ends.  A flushed buffer's ``tag`` is the nearest
  BLOCK_TAGS ancestor at the time of its first piece ('body' when
  none); its ``pre`` flag is the first piece's pre context.

S-H4 classification.  Per flushed buffer let total/link/bp chars be
  the sums of ``len(collapse_ws(piece).strip(' '))`` over all /
  in-link / in-bp pieces, and ``ld = link/total`` (0 when total==0).
  Lines: split the concatenated raw text on the ``\\x00`` sentinel;
  in pre context split each segment further on ``'\\n'`` and keep
  verbatim minus a trailing ``'\\r'``; otherwise take
  ``collapse_ws(segment).strip(' ')``; drop lines that are empty
  after ``.strip()``.  A buffer with no surviving lines emits
  nothing.  Otherwise it is DROPPED as boilerplate when
  ``2*bp_chars > total_chars``; kept when its tag is a heading and
  ``ld <= LINK_DENSITY_MAX``; kept when in pre context; else kept iff
  ``words >= CONTENT_MIN_WORDS and ld <= LINK_DENSITY_MAX`` where
  ``words`` sums ``word_count`` over the surviving lines.

S-H5 media extraction.  A MEDIA_TAGS start tag with a non-empty
  ``src`` attribute, while not suppressed and not in boilerplate
  context, flushes the buffer and emits a media record with
  ``media_ref = src`` and ``text = alt attribute or ''``.

S-H6 serialization.  Records (kept blocks + extracted media) stay in
  document order; each carries the absolute source position of its
  first piece / tag.  Input ``kind='media'`` spans re-enter after the
  last record whose source position <= the media span's anchor (total
  chars of html chunks preceding it; before everything when none),
  preserving input order.  Global 1-based line counter across blocks;
  1-based block counter ``k``.  Rendering (exact grammar, see
  ``render_block_header`` / ``render_line``):

    block:  ``doc_id={d} block_id=b-{k} tag={tag} words={w} ld={ld:.2f} {start} {end}``
    line:   ``line={n} tag={tag}:{text}``
    media:  kind='media', text / media_ref pass through (alt / src).

  Output ``offset`` is the dense 0-based index over the final
  sequence.
"""

from __future__ import annotations

import re

# ---- S-H2: element classes -------------------------------------------------
# Subtrees whose content is never main content (head machinery, code,
# vector/embedded viewers, form plumbing).  Suppression applies to all
# text data and media inside.
STRIP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "head",
        "title",
        "meta",
        "link",
        "base",
        "svg",
        "math",
        "iframe",
        "object",
        "embed",
        "param",
        "textarea",
        "datalist",
    }
)

# DOM-ancestor boilerplate rule: content inside these is site chrome,
# not article body, regardless of its text density.
BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "menu", "button"}
)

# Flush boundaries for block building (HTML block-level elements plus
# table/list structure).
BLOCK_TAGS = frozenset(
    {
        "address",
        "article",
        "aside",
        "blockquote",
        "body",
        "caption",
        "center",
        "dd",
        "details",
        "dialog",
        "div",
        "dl",
        "dt",
        "fieldset",
        "figcaption",
        "figure",
        "footer",
        "form",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "header",
        "hr",
        "html",
        "li",
        "main",
        "menu",
        "nav",
        "ol",
        "p",
        "pre",
        "section",
        "summary",
        "table",
        "tbody",
        "td",
        "tfoot",
        "th",
        "thead",
        "tr",
        "ul",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

PRE_TAGS = frozenset({"pre"})

# HTML5 void elements: start tags that never get a matching end tag.
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

# S-H5: tags whose src attribute yields an extracted media span.
MEDIA_TAGS = frozenset({"img", "video", "audio", "source"})

# ---- S-H4: densometric classification --------------------------------------
CONTENT_MIN_WORDS = 5
LINK_DENSITY_MAX = 0.5

# Internal <br> line-break sentinel (S-H1 frees NUL by mapping it to
# U+FFFD first).
BR_SENTINEL = "\x00"
NUL_REPLACEMENT = "�"

# ---- normative micro-definitions ------------------------------------------

_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")


def collapse_ws(s: str) -> str:
    """HTML whitespace normalization: runs of ASCII whitespace -> ' '."""
    return _WS_RUN.sub(" ", s)


def word_count(s: str) -> int:
    """Words = maximal non-space runs after collapse (SQL-expressible:
    len(list_filter(split(trim(collapsed), ' '), w -> w != '')))."""
    return sum(1 for w in collapse_ws(s).strip(" ").split(" ") if w)


def piece_chars(s: str) -> int:
    """Char weight of one text piece for the density sums."""
    return len(collapse_ws(s).strip(" "))


def decode_charref(ref: str) -> str:
    """Numeric character reference body ('x27' / '39') -> char; invalid
    or out-of-range references are kept literally (both implementations
    must agree, so no exception may escape)."""
    try:
        cp = int(ref[1:], 16) if ref[:1] in ("x", "X") else int(ref)
        if cp == 0:
            return NUL_REPLACEMENT
        return chr(cp)
    except (ValueError, OverflowError):
        return f"&#{ref};"


def decode_entityref(name: str) -> str:
    """Named entity -> char(s) via the stdlib html5 table; unknown
    entities are kept literally (tolerant-HTML rule)."""
    import html as _html

    out = _html.unescape(f"&{name};")
    return out


def line_start_offsets(text: str) -> list[int]:
    """Absolute offset of each physical line start, for converting
    HTMLParser.getpos() (1-based line, 0-based col) to an absolute
    char offset."""
    starts = [0]
    i = text.find("\n")
    while i != -1:
        starts.append(i + 1)
        i = text.find("\n", i + 1)
    return starts


def absolute_pos(starts: list[int], pos: tuple[int, int]) -> int:
    lineno, col = pos
    return starts[lineno - 1] + col


# ---- S-H6: output grammar ---------------------------------------------------


def render_block_header(
    doc_id: str, k: int, tag: str, words: int, ld: float, start: int, end: int
) -> str:
    return (
        f"doc_id={doc_id} block_id=b-{k} tag={tag} "
        f"words={words} ld={ld:.2f} {start} {end}"
    )


def render_line(n: int, tag: str, text: str) -> str:
    return f"line={n} tag={tag}:{text}"
