"""Pure, vectorizable URL operations.

Replicates the reference's URL contract exactly:

* ``resolve_url``    — /root/reference/lib/upton.rb:233-259 and the full error
  contract of /root/reference/spec/unit/resolve_url_spec.rb.
* ``slug``           — /root/reference/lib/upton.rb:348-350 (including the
  unescaped-dot regex quirk: ``/.html.*/`` matches ANY char followed by "html").
* ``next_index_page_url`` successor — /root/reference/lib/upton.rb:149-164.
* ``md5_hash``       — the stash cache key, /root/reference/lib/upton/downloader.rb:128.
* ``readable_filename`` — /root/reference/lib/upton/downloader.rb:131-139.

Everything here is pure (no Ray, no IO) so it runs inside ``map_batches``
workers; the batch-level helpers take/return numpy object arrays.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit

import numpy as np

__all__ = [
    "ArgumentError",
    "resolve_url",
    "resolve_urls",
    "slug",
    "slugs",
    "md5_hash",
    "md5_hashes",
    "shard_hashes",
    "host_of",
    "hosts_of",
    "next_index_page_url",
    "readable_filename",
    "stash_filenames",
]


class ArgumentError(ValueError):
    """Python stand-in for Ruby's ArgumentError raised by resolve_url."""


# characters legal in an RFC-3986 URI reference (Ruby's URI() raises
# InvalidURIError on anything outside this set, e.g. spaces)
_URI_CHARS = re.compile(r"^[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*$")
_ABS_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _check_uri_str(s: object, label: str) -> str:
    if not isinstance(s, str):
        raise ArgumentError(f"{s!r} must be represent a valid relative or absolute URI")
    if not _URI_CHARS.match(s):
        raise ArgumentError(f"{s!r} must be represent a valid relative or absolute URI")
    return s


def resolve_url(href: object, base: object) -> str:
    """RFC-3986 join of a possibly-relative href against an absolute base.

    Contract (spec/unit/resolve_url_spec.rb):
      * either arg None / non-str / invalid URI chars -> ArgumentError
      * base not absolute (no scheme)                 -> ArgumentError
      * absolute href passes through unchanged
      * "" -> base;  "#frag"/"?q" -> appended;  "//host/" inherits base scheme
    """
    base = _check_uri_str(base, "base")
    if not _ABS_SCHEME.match(base):
        raise ArgumentError(f"{base} must be absolute")
    href = _check_uri_str(href, "href")
    if _ABS_SCHEME.match(href):
        return href
    return urljoin(base, href)


def resolve_urls(hrefs: np.ndarray, base: str) -> np.ndarray:
    """Vectorized resolve against one constant base (Upton always resolves
    index hrefs against the seed @index_url — upton.rb:270-288, quirk Q3).

    Nulls (None) propagate: an <a> without href stays None (quirk Q2,
    upton.rb:281-288). Invalid rows raise ArgumentError like the scalar form.
    """
    base = _check_uri_str(base, "base")
    if not _ABS_SCHEME.match(base):
        raise ArgumentError(f"{base} must be absolute")
    sp = urlsplit(base)
    origin = f"{sp.scheme}://{sp.netloc}"
    base_dir = base[: base.rfind("/") + 1] if "/" in sp.path else origin + "/"

    out = np.empty(len(hrefs), dtype=object)
    for i, h in enumerate(hrefs):
        if h is None:
            out[i] = None
        elif not isinstance(h, str) or not _URI_CHARS.match(h):
            raise ArgumentError(f"{h!r} must be represent a valid relative or absolute URI")
        elif _ABS_SCHEME.match(h):
            out[i] = h
        elif h == "":
            out[i] = base
        elif h.startswith("//"):
            out[i] = f"{sp.scheme}:{h}"
        elif h.startswith("/"):
            out[i] = origin + h
        elif h[0] not in "?#." and ".." not in h and "/./" not in h:
            # common fast path: plain relative path (no dot-segments)
            out[i] = base_dir + h
        else:
            out[i] = urljoin(base, h)
    return out


def slug(url: str) -> str:
    """Last path segment minus query and (any-char+'html'+rest) suffix.

    Replicates upton.rb:348-350 including Ruby split() dropping *trailing*
    empty fields and the unescaped dot in /.html.*/.
    """
    parts = url.split("/")
    while parts and parts[-1] == "":
        parts.pop()
    last = parts[-1] if parts else ""
    last = re.sub(r"\?.*", "", last, count=1)
    return re.sub(r".html.*", "", last, count=1)


def slugs(urls: np.ndarray) -> np.ndarray:
    return np.array([slug(u) if u is not None else None for u in urls], dtype=object)


def md5_hash(url: str) -> str:
    """Canonical page/stash key (downloader.rb:128)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def md5_hashes(urls) -> np.ndarray:
    return np.array([hashlib.md5(u.encode("utf-8")).hexdigest() for u in urls], dtype=object)


def shard_hashes(urls, num_shards: int) -> np.ndarray:
    """Fast stable shard assignment for seen-set / frontier routing.

    Uses pandas' stable 64-bit string hash (process-independent, unlike
    builtin hash()); md5 identity is kept only for checkpoint keys.
    """
    import pandas as pd

    h = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
    return (h % np.uint64(num_shards)).astype(np.int32)


_HOST_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)")


def host_of(url: str) -> str:
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m else ""


def hosts_of(urls) -> np.ndarray:
    return np.array([host_of(u) if isinstance(u, str) else "" for u in urls], dtype=object)


def next_index_page_url(url: str, pagination_index: int, *, paginated: bool,
                        pagination_param: str = "page", pagination_max_pages: int = 2) -> str:
    """Index-pagination successor (P1, upton.rb:149-164).

    Non-paginated -> the url unchanged. Paginated -> set/overwrite the
    pagination query param (existing params keep their position, like Ruby's
    Hash round-trip through decode/encode_www_form); past the page budget -> "".
    """
    if not paginated:
        return url
    if pagination_index > pagination_max_pages:
        return ""
    sp = urlsplit(url)
    query = dict(parse_qsl(sp.query, keep_blank_values=True)) if sp.query else {}
    query[pagination_param] = str(pagination_index)
    new_q = urlencode(query)
    out = f"{sp.scheme}://{sp.netloc}{sp.path}" if sp.scheme else sp.path
    out += f"?{new_q}"
    if sp.fragment:
        out += f"#{sp.fragment}"
    return out


MAX_FILENAME_LENGTH = 130  # downloader.rb:19


def readable_filename(url: str, cache_location: str) -> str:
    """Human-readable stash filename (downloader.rb:131-139)."""
    clean_max = MAX_FILENAME_LENGTH - len("html") - len(cache_location)
    clean = re.sub(r"[^A-Za-z0-9\-_]", "", url)[:clean_max]
    return f"{clean}.html"


def stash_filenames(urls, readable: bool, cache_location: str = "") -> np.ndarray:
    """Reference-exact stash filename per checkpointed page
    (downloader.rb:122-139): ``md5(url).html`` by default, the sanitized
    readable form under ``cfg.readable_filenames`` — carried as the
    ``stash_key`` column of the page checkpoint so an external consumer
    can map checkpoint rows onto the reference's stash files."""
    if readable:
        return np.array([readable_filename(u, cache_location) for u in urls],
                        dtype=object)
    return np.array([h + ".html" for h in md5_hashes(urls)], dtype=object)


def canonicalize_url(url: str) -> str:
    """Canonical URL form for seen-set/dedup keys: lowercase scheme+host,
    strip default ports (http:80 / https:443), drop the fragment, sort query
    parameters (lexicographic on the raw k=v atoms — no percent-decoding, so
    canonicalization never changes what the server would see).  IPv6 literal
    hosts keep their brackets and userinfo is preserved (URLs that differ
    only in credentials must not collapse to one seen key)."""
    from urllib.parse import urlsplit, urlunsplit

    s = urlsplit(url)
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    if ":" in host:                     # IPv6 literal: re-bracket
        host = f"[{host}]"
    port = s.port
    if port and not ((scheme == "http" and port == 80)
                     or (scheme == "https" and port == 443)):
        host = f"{host}:{port}"
    if s.username:
        cred = s.username + (f":{s.password}" if s.password else "")
        host = f"{cred}@{host}"
    query = "&".join(sorted(s.query.split("&"))) if s.query else ""
    return urlunsplit((scheme, host, s.path, query, ""))


def canonicalize_urls(urls) -> list[str]:
    return [canonicalize_url(u) for u in urls]
