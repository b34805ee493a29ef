"""RSpec-conformance scenarios over the PARQUET web store: the bucketed
corpus path (point lookups with predicate pruning + bucket LRU) must
reproduce the sequential oracle exactly, like the dict-web path does —
quirks included (empty pages, nil hrefs, error-terminated pagination)."""

import copy

import pytest

from upton_ray.oracle import UptonOracle
from upton_ray.scenarios import scenario_configs

CFGS = scenario_configs()
# scenarios whose web interaction is pure fetch/extract (status_overlay and
# sleep accounting work identically; continuation uses successor URLs that
# are absent from the corpus — also covered)
NAMES = ["basic", "relative", "list", "table", "paginated",
         "paginated_error", "instance_error", "dedup_stash", "continuation"]


@pytest.fixture(scope="module")
def parquet_web(ray_session, fixture_web, tmp_path_factory):
    import pyarrow as pa
    import ray.data

    from upton_ray import schema, sinks

    t = pa.table({
        "doc_id": pa.array(list(fixture_web.keys()), pa.string()),
        "spans": schema.spans_array(list(fixture_web.values())),
    })
    path = str(tmp_path_factory.mktemp("pqweb") / "corpus")
    sinks.write_web(ray.data.from_arrow(t), path, num_buckets=4)
    return ("parquet", path, 4)


@pytest.mark.parametrize("name", NAMES)
def test_scenario_on_parquet_store(name, ray_session, fixture_web, parquet_web):
    from upton_ray.engine import Crawler

    cfg = CFGS[name]
    oracle = UptonOracle(copy.deepcopy(cfg), fixture_web).scrape()
    res = Crawler(cfg, parquet_web).crawl(trace=True)
    assert res.documents() == oracle.documents, f"{name}: documents differ"
    if cfg.url_array is None:
        assert res.index_urls == oracle.index_urls, f"{name}: index order differs"
    assert res.fetched_urls == oracle.seen, f"{name}: URL-seen set differs"
    assert res.sleeps == oracle.sleeps, f"{name}: sleep count differs"
