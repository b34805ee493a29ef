"""HTML → span-document conversion for the real-HTTP fetch path.

The engine's data model is pre-parsed span sequences (FIXTURES.md §1): each
span is ``(kind, text, media_ref, offset)`` where ``kind`` is an element
*path tag* like ``section#river/section/h1/a`` and the selector model
(:mod:`upton_ray.selector`) matches CSS/XPath predicates against those
paths.  The reference parses fetched HTML with Nokogiri and matches
selectors against the DOM (lib/upton.rb:281-288, lib/upton/utils.rb:14-41);
this module is the equivalent parse step: stdlib ``html.parser`` → span
rows, so :class:`upton_ray.fetch.HttpWebStore` can feed real web pages into
the same extract pipeline.

Encoding contract (deterministic, documented so selectors can rely on it):

* Each emitted span's ``kind`` is the element's ancestor path joined by
  ``/``, with the ``html``/``body`` wrappers dropped (fixture kinds are
  rootless; rooted XPath still anchors correctly at the first real
  segment).
* A path segment is ``tag[#id][.class…][[n]]`` — tag always present, id
  then classes in source order, and a 1-based ``[n]`` sibling ordinal
  appended only for table-structure tags (``table``/``tr``/``td``/``th``,
  counted among same-signature siblings) — the fixture style, and what
  ``:nth-of-type`` / XPath ``[n]`` predicates target.
* Spans are emitted for: anchors with an ``href`` (text = full inner text,
  media_ref = raw href), media elements (``img``/``video``/``audio``/
  ``source`` → kind ``media.<tag>``, media_ref = ``src``), and any other
  element whose DIRECT text content is non-empty (text = that content,
  whitespace-collapsed).  Direct-text-only keeps a ``div`` from
  duplicating every nested paragraph.
* ``offset`` is document order, 0-based, strictly increasing.
* ``script``/``style``/comment content is invisible and never emitted.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")
_ORDINAL_TAGS = frozenset({"table", "tr", "td", "th"})
_MEDIA_TAGS = frozenset({"img", "video", "audio", "source"})
_VOID_TAGS = frozenset({"img", "br", "hr", "meta", "link", "input",
                        "source", "area", "base", "col", "embed",
                        "track", "wbr"})
_INVISIBLE = frozenset({"script", "style"})
_DROP_SEGMENTS = frozenset({"html", "body", "head"})


def _segment(tag: str, attrs: dict) -> str:
    seg = tag
    if attrs.get("id"):
        seg += "#" + attrs["id"]
    for cls in (attrs.get("class") or "").split():
        seg += "." + cls
    return seg


class _SpanParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        # stack frames: [segment, path, direct_text_parts, sibling_counter]
        self.stack: list[list] = []
        self.spans: list[dict] = []
        self._root_counts: dict[str, int] = {}
        self._anchor_depth = 0          # >0: inside an <a>, collect ALL text
        self._anchor_texts: list[list[str]] = []
        self._invisible = 0

    # -- helpers ----------------------------------------------------------

    def _path_of(self, seg: str) -> str:
        parts = [f[0] for f in self.stack] + [seg]
        parts = [p for p in parts
                 if p.split("#")[0].split(".")[0].split("[")[0]
                 not in _DROP_SEGMENTS]
        return "/".join(parts) if parts else seg

    def _emit(self, kind: str, text: str, media_ref: str):
        self.spans.append({"kind": kind, "text": text,
                           "media_ref": media_ref,
                           "offset": len(self.spans)})

    def _ordinal(self, seg: str, tag: str) -> str:
        if tag not in _ORDINAL_TAGS:
            return seg
        counts = self.stack[-1][3] if self.stack else self._root_counts
        counts[seg] = counts.get(seg, 0) + 1
        return f"{seg}[{counts[seg]}]"

    # -- parser events ----------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _INVISIBLE:
            self._invisible += 1
            return
        if self._invisible:
            return
        ad = dict(attrs)
        seg = self._ordinal(_segment(tag, ad), tag)
        path = self._path_of(seg)
        if tag in _MEDIA_TAGS:
            self._emit(f"media.{tag}", "", ad.get("src") or "")
            if tag in _VOID_TAGS:
                return
        if tag == "a":
            self._anchor_depth += 1
            self._anchor_texts.append([])
            # href=None (attribute absent) stays None → span still emitted
            # with media_ref "" — the nil-URL quirk row (M7/Q2) is KEPT
            self.stack.append([seg, path, [], {}, ("a", ad.get("href"))])
            return
        if tag in _VOID_TAGS:
            return
        self.stack.append([seg, path, [], {}, None])

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS and tag not in _INVISIBLE \
                and not self._invisible:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _INVISIBLE:
            self._invisible = max(0, self._invisible - 1)
            return
        if self._invisible or not self.stack:
            return
        # pop to the nearest matching open tag (forgiving of bad nesting)
        open_tags = [f[0].split("#")[0].split(".")[0].split("[")[0]
                     for f in self.stack]
        if tag not in open_tags:
            return
        while self.stack:
            frame = self.stack.pop()
            ftag = frame[0].split("#")[0].split(".")[0].split("[")[0]
            self._close_frame(frame)
            if ftag == tag:
                break

    def _close_frame(self, frame):
        seg, path, texts, _counts, anchor = frame
        if anchor is not None:
            self._anchor_depth = max(0, self._anchor_depth - 1)
            inner = _WS.sub(" ", "".join(self._anchor_texts.pop())).strip()
            self._emit(path, inner, anchor[1] or "")
            return
        direct = _WS.sub(" ", "".join(texts)).strip()
        if direct:
            self._emit(path, direct, "")

    def handle_data(self, data):
        if self._invisible:
            return
        if self._anchor_depth and self._anchor_texts:
            self._anchor_texts[-1].append(data)
        if self.stack and self.stack[-1][4] is None:
            self.stack[-1][2].append(data)

    def close(self):
        super().close()
        while self.stack:               # unclosed tags at EOF
            self._close_frame(self.stack.pop())


def html_to_spans(html: str) -> list[dict]:
    """Parse an HTML document into span rows (see module docstring for the
    kind-encoding contract).  Never raises on malformed HTML — ``html.parser``
    is forgiving and unclosed tags are flushed at EOF."""
    p = _SpanParser()
    p.feed(html)
    p.close()
    return p.spans
