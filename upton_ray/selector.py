"""Selector model: CSS/XPath-ish selectors as predicates over span ``kind`` paths.

The reference matches Nokogiri CSS/XPath selectors against parsed HTML
(parse_index upton.rb:281-288, Utils.list/table utils.rb:14-41).  Our documents
are already parsed into span sequences whose ``kind`` is an element *path tag*
(FIXTURES.md §1), e.g.::

    "section#river/section/h1/a"                  # a river headline anchor
    ".compact-list/li.compact-item/a.title-link"  # a search-result link
    "table.wikitable[2]/tr[3]/td[1]"              # a table cell

A selector compiles to a single RE2-compatible regex over the kind path with
real combinator semantics: each selector part must match a path segment, in
order; descendant combinators (CSS whitespace, XPath ``//``) allow arbitrary
segments in the gaps, child combinators (CSS ``>``, XPath ``/``) require
adjacent segments; and the final part must match the LAST segment (the span
is the element the selector names).  Supported part forms (the reference
accepts any Nokogiri CSS/XPath — upton.rb:283, utils.rb:21,36 — and these
cover everything expressible over span kinds):

* CSS: ``tag``, ``*``, ``.class``, ``#id``, combinations (``a.x#y``),
  attribute selectors over the attrs kinds encode (``[class~=x]``,
  ``[class="x"]``, ``[id=x]``), ``:nth-of-type(n)`` / ``:nth-child(n)``
  (→ the kind's sibling ordinal ``[n]``), and ``>``.  Attribute selectors
  over anything else (e.g. ``[href=…]``) raise ValueError — kinds don't
  encode those attrs, so silent no-match would be a lie.
* XPath: ``//tag`` / ``/tag`` steps with predicates ``[n]``, ``[@id='x']``,
  ``[@class='x']``, ``[contains(@class, 'x')]`` and the Nokogiri-era
  ``contains(concat(" ", normalize-space(@class), " "), " x ")`` idiom
  (spec/upton_spec.rb:128); a rooted ``/a/…`` anchors at the path start.

Within a segment, a tag must match at the segment start and each constraint
unit (class/id/ordinal) must appear in source order, with other units allowed
between — class ORDER is irrelevant for single-class selectors, matching
Nokogiri.  Matching is vectorized over pyarrow string arrays with
``pc.match_substring_regex`` (RE2: no lookarounds used).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "normalize_selector",
    "parse_selector",
    "selector_regex",
    "kind_match_mask",
    "kind_prefix_mask",
    "match_kind",
    "cell_of",
]

# XPath class-contains idiom used by the reference's table spec
# (spec/upton_spec.rb:128): //table[contains(concat(" ", normalize-space(@class), " "), " wikitable ")][2]
_XPATH_CLASS = re.compile(
    r"^//(\w+)\[contains\(concat\(\"? ?\"?, ?normalize-space\(@class\), ?\"? ?\"?\), ?['\"] (?P<cls>[\w\-]+) ['\"]\)\]"
    r"(?:\[(?P<idx>\d+)\])?$"
)

_GAP = r"/(?:[^/]*/)*"  # descendant combinator: at least one "/", any segments between


def normalize_selector(selector: str) -> str:
    """Selector -> canonical whitespace-collapsed part path ("a/b/c")."""
    selector = selector.strip()
    m = _XPATH_CLASS.match(selector)
    if m:
        path = f"{m.group(1)}.{m.group('cls')}"
        if m.group("idx"):
            path += f"[{m.group('idx')}]"
        return path
    return re.sub(r"\s+", "/", selector)


# skip other class/id units between required constraint units (in-order match)
_FILL = r"(?:[.#][\w\-]+)*"
# allow trailing classes/ids/ordinal after the matched constraints
_TAIL = r"(?:[.#\[][^/]*)?"


def _attr_unit(content: str) -> str:
    """One predicate/attribute-selector body -> a constraint unit over the
    kind segment: ``.cls`` / ``#id`` / ``[n]``.  Span kinds encode ONLY tag,
    classes, id and sibling ordinal (FIXTURES.md §1), so attribute selectors
    over anything else (e.g. ``[href=...]``) are rejected loudly rather than
    silently matching nothing."""
    c = content.strip()
    if re.fullmatch(r"\d+", c):
        return f"[{c}]"
    m = re.fullmatch(r"@?(class|id)\s*~?=\s*(['\"]?)([\w\-]+)\2", c)
    if m:
        return ("." if m.group(1) == "class" else "#") + m.group(3)
    m = re.fullmatch(r"contains\(\s*@class\s*,\s*['\"]\s*([\w\-]+)\s*['\"]\s*\)", c)
    if m:
        return "." + m.group(1)
    # Nokogiri-era idiom (spec/upton_spec.rb:128):
    # contains(concat(" ", normalize-space(@class), " "), " cls ")
    m = re.fullmatch(
        r"contains\(concat\([^,]*,\s*normalize-space\(@class\)\s*,[^)]*\)"
        r"\s*,\s*['\"]\s*([\w\-]+)\s*['\"]\s*\)", c)
    if m:
        return "." + m.group(1)
    raise ValueError(
        f"unsupported selector predicate [{content}]: span kind paths encode "
        "only tag/class/id/ordinal, so only class & id attribute selectors "
        "and positional predicates can match")


_PART_RE = re.compile(
    r"(?P<tag>\*|[A-Za-z][\w\-]*)?"
    r"(?P<rest>(?:[.#][\w\-]+|\[[^\]]*\]|:[\w\-]+\(\d+\))*)")
_UNIT_RE = re.compile(r"([.#][\w\-]+)|\[([^\]]*)\]|:([\w\-]+)\((\d+)\)")


def _parse_part(tok: str) -> tuple[str | None, list[str]]:
    m = _PART_RE.fullmatch(tok)
    if not m or (m.group("tag") is None and not m.group("rest")):
        raise ValueError(f"unsupported selector part {tok!r}")
    cons: list[str] = []
    for mm in _UNIT_RE.finditer(m.group("rest") or ""):
        if mm.group(1):
            cons.append(mm.group(1))
        elif mm.group(2) is not None:
            cons.append(_attr_unit(mm.group(2)))
        else:
            name, num = mm.group(3), mm.group(4)
            if name in ("nth-of-type", "nth-child"):
                cons.append(f"[{num}]")   # kind ordinal [i] (sibling position)
            else:
                raise ValueError(f"unsupported pseudo-class :{name}")
    return m.group("tag"), cons


def _parse_xpath(sel: str):
    """General ``//tag[pred]…`` XPath: ``//`` = descendant, ``/`` = child,
    predicates per :func:`_attr_unit`; a rooted ``/a/…`` anchors at the
    start of the kind path."""
    anchor = "(?:^|/)" if sel.startswith("//") else "^"
    toks = re.findall(r"(//|/)((?:\[[^\]]*\]|[^/\[])+)", sel)
    if "".join(s + p for s, p in toks) != sel:
        raise ValueError(f"unsupported XPath {sel!r}")
    parts = []
    for i, (sep, step) in enumerate(toks):
        comb = "child" if (sep == "/" and i > 0) else "desc"
        m = re.fullmatch(r"(\*|[A-Za-z][\w\-]*)((?:\[[^\]]*\])*)", step.strip())
        if not m:
            raise ValueError(f"unsupported XPath step {step!r}")
        cons = [_attr_unit(p) for p in re.findall(r"\[([^\]]*)\]", m.group(2))]
        parts.append((comb, (m.group(1), cons)))
    return anchor, parts


def parse_selector(selector: str):
    """Selector -> (start_anchor, [(combinator, (tag, constraints)), …]).
    CSS: whitespace = descendant, ``>`` = child.  XPath: see
    :func:`_parse_xpath`."""
    selector = selector.strip()
    if selector.startswith("/"):
        return _parse_xpath(selector)
    parts = []
    comb = "desc"
    for tok in re.findall(r">|[^>\s]+", selector):
        if tok == ">":
            comb = "child"
            continue
        parts.append((comb, _parse_part(tok)))
        comb = "desc"
    return "(?:^|/)", parts


def _segment_pattern(tag: str | None, constraints: list[str]) -> str:
    """RE2 pattern for one kind-path segment: tag (if any) at the segment
    start, then each constraint unit in source order with other class/id
    units allowed between (kinds list attributes in authored order)."""
    ords = [c for c in constraints if c.startswith("[")]
    units = [c for c in constraints if not c.startswith("[")]
    if tag and tag != "*":
        pat = re.escape(tag)
    elif units or ords:
        pat = "[^/]*"
    else:
        return "[^/]+"        # bare "*": any segment
    for u in units:
        pat += _FILL + re.escape(u)
    if ords:
        pat += _FILL + re.escape(ords[-1])
    else:
        pat += _TAIL
    return pat


def selector_regex(selector: str, *, prefix: bool = False) -> str | None:
    """Compile a CSS/XPath selector to an RE2 regex over kind paths.

    ``prefix=False``: the selector names the span itself (last part anchored
    at end of path).  ``prefix=True``: matches spans *under* the selected
    container (table-cell extraction) — the last part is followed by "/".
    Returns None for an empty selector (matches nothing, like Nokogiri
    searching for '').
    """
    if not selector.strip():
        return None
    anchor, parts = parse_selector(selector)
    if not parts:
        return None
    body = ""
    for i, (comb, (tag, cons)) in enumerate(parts):
        seg = _segment_pattern(tag, cons)
        if i == 0:
            body = seg
        else:
            body += ("/" if comb == "child" else _GAP) + seg
    return anchor + body + ("/" if prefix else "$")


def kind_match_mask(kinds: pa.Array | pa.ChunkedArray, selector: str) -> np.ndarray:
    """Boolean mask of spans whose kind matches the selector. Vectorized."""
    rx = selector_regex(selector)
    if rx is None:
        return np.zeros(len(kinds), dtype=bool)
    mask = pc.match_substring_regex(kinds, pattern=rx)
    return pc.fill_null(mask, False).to_numpy(zero_copy_only=False)


def kind_prefix_mask(kinds: pa.Array | pa.ChunkedArray, selector: str) -> np.ndarray:
    """Boolean mask of spans *under* the selected container. Vectorized."""
    rx = selector_regex(selector, prefix=True)
    if rx is None:
        return np.zeros(len(kinds), dtype=bool)
    mask = pc.match_substring_regex(kinds, pattern=rx)
    return pc.fill_null(mask, False).to_numpy(zero_copy_only=False)


def match_kind(kind: str, selector: str, *, prefix: bool = False) -> bool:
    """Scalar matcher (oracle / per-row paths); same regex as the masks."""
    rx = selector_regex(selector, prefix=prefix)
    return bool(rx and re.search(rx, kind))


_CELL_RE = re.compile(r"(?:^|/)(th|td|tr)(?:\[(\d+)\])?(?=/|$)")


def cell_of(kind: str) -> tuple[str, int]:
    """(cell_tag, tr_index) for a span under a table; tr_index is the 1-based
    ``tr[i]`` ordinal in the kind path (0 if absent)."""
    tr = 0
    tag = ""
    for m in _CELL_RE.finditer(kind):
        if m.group(1) == "tr" and m.group(2):
            tr = int(m.group(2))
        else:
            tag = m.group(1)
    return tag, tr
