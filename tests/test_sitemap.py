"""Sitemap seeding (upton_ray/sitemap.py): XML -> span conversion, the
level-order expansion law, cycle/depth guards, and the HttpWebStore decode
branch.  End-to-end conformance vs the sequential oracle is the "sitemap"
scenario in test_engine.py; the driver gate pins the golden records
(crawl_sitemap)."""

import pyarrow as pa

from upton_ray.sitemap import (CHILD_KIND, LOC_KIND, expand_levels,
                               sitemap_xml_to_spans)

URLSET_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.test/a.html</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc> http://h.test/b.html </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX_XML = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.test/sm1.xml</loc></sitemap>
  <sitemap><loc>sm2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_xml_to_spans():
    spans = sitemap_xml_to_spans(URLSET_XML)
    assert [s["kind"] for s in spans] == [LOC_KIND, LOC_KIND]
    assert [s["media_ref"] for s in spans] == [
        "http://h.test/a.html", "http://h.test/b.html"]   # whitespace trim
    assert [s["offset"] for s in spans] == [0, 1]


def test_sitemapindex_xml_to_spans():
    spans = sitemap_xml_to_spans(INDEX_XML)
    assert [s["kind"] for s in spans] == [CHILD_KIND, CHILD_KIND]
    assert [s["media_ref"] for s in spans] == [
        "http://h.test/sm1.xml", "sm2.xml"]


def test_non_sitemap_returns_none():
    assert sitemap_xml_to_spans("<html><body>hi</body></html>") is None
    assert sitemap_xml_to_spans("<urlset oops") is None   # unparseable


def _sm(kind, *urls):
    return [{"kind": kind, "text": "", "media_ref": u, "offset": i}
            for i, u in enumerate(urls)]


def test_expand_levels_order_and_cycle_guard(ray_session):
    """Level order (depth, parent-rank, pos); a cycle back to the root is
    expanded once; relative children resolve against the sitemap URL."""
    B = "http://s.test/"
    web = {
        B + "root.xml": _sm(CHILD_KIND, B + "a.xml", "b.xml", B + "root.xml"),
        B + "a.xml": _sm(LOC_KIND, B + "p1", B + "p2"),
        B + "b.xml": _sm(LOC_KIND, "p3") + _sm(CHILD_KIND, B + "a.xml"),
    }
    links, n_files = expand_levels(web, B + "root.xml", max_depth=4)
    t = pa.concat_tables(
        [x for x in __import__("ray").get(links.to_arrow_refs())
         if x.num_rows]).to_pylist()
    t.sort(key=lambda r: (r["seed_id"], r["dom_pos"]))
    assert [(r["seed_id"], r["dom_pos"], r["url"]) for r in t] == [
        (1, 0, B + "p1"), (1, 1, B + "p2"), (2, 0, B + "p3")]
    assert n_files == 3   # root, a, b — the self-link never re-expands


def test_expand_levels_depth_cap(ray_session):
    """A chain deeper than max_depth stops cleanly."""
    B = "http://d.test/"
    web = {
        B + "l0.xml": _sm(CHILD_KIND, B + "l1.xml"),
        B + "l1.xml": _sm(CHILD_KIND, B + "l2.xml"),
        B + "l2.xml": _sm(LOC_KIND, B + "deep"),
    }
    links, n_files = expand_levels(web, B + "l0.xml", max_depth=2)
    rows = sum(x.num_rows for x in
               __import__("ray").get(links.to_arrow_refs()))
    assert rows == 0      # l2 is below the cap; nothing extracted
    links3, _ = expand_levels(web, B + "l0.xml", max_depth=3)
    rows3 = pa.concat_tables(
        [x for x in __import__("ray").get(links3.to_arrow_refs())
         if x.num_rows])
    assert rows3["url"].to_pylist() == [B + "deep"]


def test_http_store_decodes_real_sitemap_xml():
    """HttpWebStore._get routes sitemap XML through sitemap_xml_to_spans
    (exercised store-level via the decode seam, no server needed)."""
    from upton_ray.fetch import HttpWebStore

    store = HttpWebStore()
    store._http_get = lambda target, redirects=5: (
        URLSET_XML.encode(), "application/xml")
    spans = store._get("http://h.test/sitemap.xml")
    assert [s["kind"] for s in spans] == [LOC_KIND, LOC_KIND]
    # an HTML body with a sniff-negative prefix still goes to the HTML parser
    store._http_get = lambda target, redirects=5: (
        b"<html><body><h1 class='t'>x</h1></body></html>", "text/html")
    spans = store._get("http://h.test/page.html")
    assert spans and spans[0]["kind"].endswith("h1.t")


def test_expand_levels_mixed_kind_file_dense_dom_pos(ray_session):
    """A file interleaving CHILD and LOC entries must number its locs
    DENSELY (dom_pos counts per kind): the instance_index prefix-sum
    adds base + dom_pos, so a kind-shared counter would collide the next
    file's first index (code-review finding, round-5 continuation)."""
    B = "http://mx.test/"
    web = {
        B + "r.xml": _sm(CHILD_KIND, B + "a.xml")
        + [{"kind": LOC_KIND, "text": "", "media_ref": B + "p0",
            "offset": 1},
           {"kind": LOC_KIND, "text": "", "media_ref": B + "p1",
            "offset": 2}],
        B + "a.xml": _sm(LOC_KIND, B + "p2"),
    }
    links, _ = expand_levels(web, B + "r.xml", max_depth=3)
    import ray
    rows = sorted(((r["seed_id"], r["dom_pos"], r["url"]) for t in
                   ray.get(links.to_arrow_refs()) for r in t.to_pylist()))
    assert rows == [(0, 0, B + "p0"), (0, 1, B + "p1"), (1, 0, B + "p2")]


def test_expand_levels_depth_zero_empty_not_crash(ray_session):
    B = "http://z.test/"
    web = {B + "r.xml": _sm(LOC_KIND, B + "p0")}
    links, n_files = expand_levels(web, B + "r.xml", max_depth=0)
    import ray
    assert sum(t.num_rows for t in ray.get(links.to_arrow_refs())) == 0
    assert n_files == 1


def test_sniff_sitemap_no_prefix_window():
    """A urlset behind >4 KB of comment prolog still sniffs (spec-legal;
    the old 4096-char window missed it)."""
    from upton_ray.sitemap import sniff_sitemap
    xml = "<!--" + "x" * 8000 + "--><urlset><url><loc>http://h/p</loc></url></urlset>"
    assert sniff_sitemap(xml)
    spans = sitemap_xml_to_spans(xml)
    assert spans is None or spans  # ET may reject the comment — sniff must not
