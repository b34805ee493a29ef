"""Documents-derived web: the dict (gate-scale) and bucketed-parquet-store
(scale) paths must crawl to identical records."""

import pyarrow as pa


def test_store_path_equals_dict_path(ray_session, tmp_path):
    from upton_ray import docweb
    from upton_ray.engine import Crawler

    sf = "/root/testdata/sf0.001"
    d = docweb.crawl_documents(sf, use_store=False)
    s = docweb.crawl_documents(sf, use_store=True)
    assert d.to_pylist() == s.to_pylist()
    assert d.num_rows == 500


def test_docweb_seeds_are_distinct_hosts(ray_session):
    from upton_ray import docweb

    seeds = docweb.docweb_seeds("/root/testdata/sf0.001")
    urls = [u for _, u, _ in seeds]
    assert len(urls) == len(set(urls))
    assert all(u.startswith("http://src") and u.endswith("/index.html")
               for u in urls)


def test_store_point_lookup(ray_session, tmp_path):
    """The written store serves the same spans the dict would."""
    from upton_ray import docweb
    from upton_ray.fetch import make_store

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "docweb")
    docweb.write_docweb_store(sf, path, num_buckets=4)
    store = make_store(("parquet", path, 4))
    web, _ = docweb.web_from_documents(sf)
    some = sorted(web)[:5] + [u for u in sorted(web) if "index" in u][:3]
    for u in some:
        assert store.lookup_one(u) == web[u], u
    assert store.lookup_one("http://src0.docs.example/d/999999.html") is None


def test_store_cache_is_content_keyed(ray_session, tmp_path):
    """Regenerating documents.parquet at the SAME path must miss the /tmp
    store cache (key covers rows+size+mtime+buckets), and a cache directory,
    once present, is complete (atomic rename — no _DONE sentinel races)."""
    import glob
    import os
    import shutil
    import time

    from upton_ray import docweb

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                f"{sf}/documents.parquet")

    before = set(glob.glob("/tmp/upton_ray_docweb/*"))
    t1 = docweb.crawl_documents(sf, use_store=True)
    mid = set(glob.glob("/tmp/upton_ray_docweb/*"))
    new1 = mid - before
    assert len(new1) == 1 and os.path.isdir(new1.pop())

    # "regenerate" the table: same content, different mtime -> new cache key
    time.sleep(0.02)
    os.utime(f"{sf}/documents.parquet")
    t2 = docweb.crawl_documents(sf, use_store=True)
    after = set(glob.glob("/tmp/upton_ray_docweb/*"))
    assert len(after - mid) == 1, "changed mtime must build a fresh store"
    assert t1.to_pydict() == t2.to_pydict()
