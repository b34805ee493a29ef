"""Selector model: CSS/XPath-ish selectors as predicates over span ``kind`` paths.

The reference matches Nokogiri CSS/XPath selectors against parsed HTML
(parse_index upton.rb:281-288, Utils.list/table utils.rb:14-41).  Our documents
are already parsed into span sequences whose ``kind`` is an element *path tag*
(FIXTURES.md §1), e.g.::

    "section#river/section/h1/a"                  # a river headline anchor
    ".compact-list/li.compact-item/a.title-link"  # a search-result link
    "table.wikitable[2]/tr[3]/td[1]"              # a table cell

A CSS selector compiles to a single RE2-compatible regex over the kind path
with real descendant-combinator semantics: each selector part must match a
path segment, in order, with arbitrary segments allowed in the gaps, and the
final part must match the LAST segment (the span is the element the selector
names).  Segment-matching rules:

* part with a tag (``a``, ``a.title-link``, ``section#river``): the segment
  must start with the part verbatim, optionally followed by more
  classes/ids/positional ``[i]``.
* class/id-only part (``.compact-list``, ``#most-commented``): the segment
  must contain the part as a suffix unit (so ``li.compact-list`` matches).

Matching is vectorized over pyarrow string arrays with
``pc.match_substring_regex`` (RE2: no lookarounds used).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "normalize_selector",
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


def _part_pattern(part: str) -> str:
    if part.startswith(".") or part.startswith("#"):
        return "[^/]*" + re.escape(part) + r"(?:\[\d+\])?"
    return re.escape(part) + r"(?:[.#\[][^/]*)?"


def selector_regex(selector: str, *, prefix: bool = False) -> str | None:
    """Compile a selector to an RE2 regex over kind paths.

    ``prefix=False``: the selector names the span itself (last part anchored
    at end of path).  ``prefix=True``: matches spans *under* the selected
    container (table-cell extraction) — the last part is followed by "/".
    Returns None for an empty selector (matches nothing, like Nokogiri
    searching for '').
    """
    path = normalize_selector(selector)
    if not path:
        return None
    parts = [p for p in path.split("/") if p]
    body = _GAP.join(_part_pattern(p) for p in parts)
    return "(?:^|/)" + body + ("/" if prefix else "$")


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
