"""Guarded C-regex HTML tokenizer — the fast frontend for html_kernel.

Mirrors stdlib ``html.parser.HTMLParser`` (``convert_charrefs=False``)
tokenization *exactly* on a clean markup subset, and raises
``Ineligible`` on any construct whose stdlib handling this flat scan
cannot provably reproduce — the caller then re-runs the document
through the real HTMLParser frontend.  Same design as the XML fast
path (fastparse.py): the slow path defines the semantics; the fast
path either matches it observationally or declines.

Mirrored constructs (each rule cites the stdlib behavior it copies,
CPython Lib/html/parser.py):

- data runs split at ``[<&]`` (goahead's ``interesting_normal``), with
  NUL -> U+FFFD applied by the machine contract;
- ``&#...;`` / ``&name;`` char/entity refs including the
  terminator-not-consumed rule when the ref does not end with ``;``
  (charref/entityref regexes are copied verbatim);
- bare ``&`` followed by a char outside ``[a-zA-Z#]`` emits a one-char
  data piece (goahead's ``elif (i + 1) < n`` branch);
- malformed ``&#`` is Ineligible: goahead's bail-out branch emits
  ``&#`` and then unconditionally ``break``s, so inside ``close()``
  the rest of the buffer flushes as raw unparsed data — behavior a
  flat scan cannot mirror;
- start tags restricted to a strict shape (name ``[a-zA-Z][-a-zA-Z0-9:._]*``,
  well-formed attrs, quoted values without ``<``); attr names
  lowercased and values unescaped exactly like parse_starttag;
- ``<tag/>`` emits start+end (handle_startendtag's default);
- ``<script>``/``<style>`` enter CDATA mode: content is skipped up to
  a clean ``</script\\s*>`` (set_cdata_mode + parse_endtag) — content
  events are dropped, which is observationally identical because both
  tags are STRIP_TAGS (suppressed) for the machine;
- end tags restricted to ``</\\s*name\\s*>`` (endtagfind);
- ``<!--...-->`` comments closed by ``--\\s*>`` (parse_comment);
- ``<!decl>`` without quotes/brackets (parse_html_declaration);
- ``<?...>`` processing instructions (parse_pi);
- ``<`` not opening any construct emits a one-char data piece.

Everything else — marked sections, quoted declarations, unterminated
constructs, refs at buffer end, malformed tags — is Ineligible.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

from . import html_spec as H


class Ineligible(Exception):
    """Construct the fast scan cannot provably mirror; use HTMLParser."""


_NAME = r"[a-zA-Z][-a-zA-Z0-9:._]*"
_ATTR = (
    r"[a-zA-Z_:@][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'|[^\s>\"'`=<]+))?"
)
_SPECIAL = re.compile(r"[<&]")
_STARTTAG = re.compile(rf"<({_NAME})((?:\s+(?:{_ATTR}))*)\s*(/?)>")
_ENDTAG = re.compile(rf"</\s*({_NAME})\s*>")
_ATTR_ITER = re.compile(
    r"([a-zA-Z_:@][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<]*)\"|'([^'<]*)'|([^\s>\"'`=<]+)))?"
)
_COMMENT_CLOSE = re.compile(r"--\s*>")  # _markupbase._commentclose
_DECL = re.compile(r"<![a-zA-Z][^<>\[\"']*>")
# verbatim from html.parser:
_CHARREF = re.compile("&#(?:[0-9]+|[xX][0-9a-fA-F]+)[^0-9a-fA-F]")
_ENTITYREF = re.compile("&([a-zA-Z][-.a-zA-Z0-9]*)[^a-zA-Z0-9]")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}", re.I) for t in ("script", "style")
}
_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_AMP_INCOMPLETE = _ALPHA | {"#"}

_NUL_REPL = H.NUL_REPLACEMENT


def scan(html: str, machine) -> None:
    """Feed machine start/end/data events for the whole document, or
    raise Ineligible (machine state is then garbage — discard it)."""
    n = len(html)
    i = 0
    search = _SPECIAL.search
    data = machine.data
    while i < n:
        sp = search(html, i)
        if sp is None:
            seg = html[i:]
            data(seg.replace("\x00", _NUL_REPL) if "\x00" in seg else seg, i)
            return
        j = sp.start()
        if j > i:
            seg = html[i:j]
            data(seg.replace("\x00", _NUL_REPL) if "\x00" in seg else seg, i)
        if html[j] == "&":
            i = _amp(html, j, n, data)
        else:
            i = _lt(html, j, n, machine)


def _amp(html: str, j: int, n: int, data) -> int:
    if html.startswith("&#", j):
        m = _CHARREF.match(html, j)
        if m:
            data(H.decode_charref(m.group()[2:-1]), j)
            k = m.end()
            return k if html[k - 1] == ";" else k - 1
        # stdlib's malformed-&# branch emits '&#' and then BREAKS out
        # of goahead unconditionally; when that happens inside close()
        # the rest of the buffer is flushed as raw data (tags never
        # parsed).  A flat scan cannot mirror that — decline.
        raise Ineligible("malformed &# reference")
    m = _ENTITYREF.match(html, j)
    if m:
        data(H.decode_entityref(m.group(1)), j)
        k = m.end()
        return k if html[k - 1] == ";" else k - 1
    if j + 1 < n and html[j + 1] not in _AMP_INCOMPLETE:
        data("&", j)
        return j + 1
    raise Ineligible("ambiguous & at buffer end")


def _lt(html: str, j: int, n: int, machine) -> int:
    nxt = html[j + 1] if j + 1 < n else ""
    if nxt in _ALPHA:
        m = _STARTTAG.match(html, j)
        if m is None:
            raise Ineligible(f"unclean start tag at {j}")
        tag = m.group(1).lower()
        if tag in H.MEDIA_TAGS:
            attrs = [
                (
                    am.group(1).lower(),
                    _attr_value(am.group(2), am.group(3), am.group(4)),
                )
                for am in _ATTR_ITER.finditer(m.group(2))
            ]
        else:
            attrs = ()
        machine.start(tag, attrs, j)
        if m.group(3):  # <tag/> -> handle_startendtag: start + end
            machine.end(tag)
            return m.end()
        if tag in _CDATA_CLOSE:  # CDATA_CONTENT_ELEMENTS
            cm = _CDATA_CLOSE[tag].search(html, m.end())
            if cm is None:
                raise Ineligible(f"unclosed <{tag}>")
            em = _ENDTAG.match(html, cm.start())
            if em is None or em.group(1).lower() != tag:
                raise Ineligible(f"unclean </{tag}>")
            machine.end(tag)
            return em.end()
        return m.end()
    if nxt == "/":
        m = _ENDTAG.match(html, j)
        if m is None:
            raise Ineligible(f"unclean end tag at {j}")
        machine.end(m.group(1).lower())
        return m.end()
    if nxt == "!":
        if html.startswith("<!--", j):
            cm = _COMMENT_CLOSE.search(html, j + 4)
            if cm is None:
                raise Ineligible("unterminated comment")
            return cm.end()
        m = _DECL.match(html, j)
        if m is None:
            raise Ineligible(f"unclean declaration at {j}")
        return m.end()
    if nxt == "?":
        g = html.find(">", j + 2)
        if g < 0:
            raise Ineligible("unterminated processing instruction")
        return g + 1
    # '<' opening nothing: one-char data piece (goahead's else branch)
    machine.data("<", j)
    return j + 1


def _attr_value(dq, sq, uq) -> str | None:
    v = dq if dq is not None else (sq if sq is not None else uq)
    if v:
        # parse_starttag unescapes every non-empty attribute value
        return _unescape(v) if "&" in v else v
    return v
