"""Lance corpus path: write_web(fmt="lance") + LanceWebStore round trip.

The sandbox does not ship the ``lance`` package, so these tests skip here —
they exist so the lance branch is EXERCISED anywhere the package is present
(the layout contract itself — bucket column, schema, point-lookup behavior —
is covered against the parquet twin below, which shares all the store code
except the dataset constructor)."""

import numpy as np
import pyarrow as pa
import pytest

from upton_ray import schema, sinks


def _tiny_web_ds():
    import ray.data

    urls = [f"http://h{i % 3}.test/p/{i}" for i in range(12)]
    spans = [[{"kind": "h1.article-title", "text": f"t{i}", "media_ref": "",
               "offset": 0}] for i in range(12)]
    t = pa.table({"doc_id": pa.array(urls, pa.string()),
                  "spans": schema.spans_array(spans)})
    return ray.data.from_arrow(t), urls


def test_write_web_lance_requires_package(ray_session, tmp_path):
    """Without lance installed the writer fails loudly, never silently."""
    if sinks.HAVE_LANCE:
        pytest.skip("lance installed: the round-trip test covers this")
    ds, _ = _tiny_web_ds()
    with pytest.raises(NotImplementedError):
        sinks.write_web(ds, str(tmp_path / "web"), num_buckets=4, fmt="lance")


def test_lance_roundtrip(ray_session, tmp_path):
    pytest.importorskip("lance")
    from upton_ray.fetch import make_store

    ds, urls = _tiny_web_ds()
    path = str(tmp_path / "web_lance")
    sinks.write_web(ds, path, num_buckets=4, fmt="lance")
    store = make_store(("lance", path, 4))
    got = store.lookup_one(urls[5])
    assert got and got[0]["text"] == "t5"
    assert store.page_len(urls[7]) == 1
    assert store.page_len("http://h0.test/missing") is None
    tbl = store.lookup_table(np.array(urls, dtype=object))
    assert len(tbl) == len(urls)


def test_parquet_twin_of_lance_contract(ray_session, tmp_path):
    """The shared layout contract, exercised via the parquet twin (all store
    code above the dataset constructor is common to both formats)."""
    from upton_ray.fetch import make_store

    ds, urls = _tiny_web_ds()
    path = str(tmp_path / "web_parquet")
    sinks.write_web(ds, path, num_buckets=4, fmt="parquet")
    store = make_store(("parquet", path, 4))
    assert store.lookup_one(urls[5])[0]["text"] == "t5"
    assert store.page_len("http://h0.test/missing") is None
    assert len(store.lookup_table(np.array(urls, dtype=object))) == len(urls)
