"""Per-partition lineage: a crashed run resumes by re-walking ONLY the
buckets without a _SUCCESS marker; completed buckets stream from checkpoint
as cache reads (no fetch, no sleep) and final records are identical."""

import os
import shutil

import pytest


@pytest.fixture(scope="module")
def crawled(ray_session, tmp_path_factory):
    from upton_ray import sinks, synth
    from upton_ray.config import CrawlConfig
    from upton_ray.engine import Crawler

    p = synth.ScaleParams(n_hosts=6, pages_per_host=15, links_per_page=5,
                          spans_per_page=8, media_fraction=0.25,
                          zipf_alpha=0.3, seed=11)
    root = tmp_path_factory.mktemp("presume")
    corpus = str(root / "corpus")
    sinks.write_web(synth.scale_web(p, parallelism=4), corpus, num_buckets=4)

    def cfg(stash):
        return CrawlConfig(
            index_selector="section#river section h1 a",
            extractor="css:h1.article-title",
            paginated=True, pagination_param="p", pagination_max_pages=1000,
            sleep_time_between_requests=0, debug=True, index_debug=True,
            num_seen_shards=2, fetch_concurrency=2, fetch_batch_size=256,
            stash_folder=stash)

    seeds = [(h, synth.index_url(p, h), "section#river section h1 a")
             for h in range(p.n_hosts)]
    stash = str(root / "stash")
    c = Crawler(cfg(stash), ("parquet", corpus, 4), seeds=seeds)
    golden = c.crawl().records_table()
    c.shutdown()
    return corpus, seeds, cfg, stash, golden


def _key_rows(t):
    return list(zip(t["instance_index"].to_pylist(),
                    t["pagination_index"].to_pylist(),
                    t["row_no"].to_pylist(),
                    [tuple(r) for r in t["record"].to_pylist()]))


def test_marker_per_completed_bucket(crawled):
    _, _, _, stash, _ = crawled
    ckpt = os.path.join(stash, "fetched_round1")
    buckets = [d for d in os.listdir(ckpt) if d.startswith("bucket=")]
    assert buckets, "bucketed checkpoint must exist"
    for d in buckets:
        assert os.path.exists(os.path.join(ckpt, d, "_SUCCESS"))
    import json

    lin = json.load(open(os.path.join(stash, "lineage.json")))
    for d in buckets:
        assert f"round1/{d}" in lin, "per-partition lineage entry missing"


def test_crashed_bucket_rewalks_alone(crawled):
    from upton_ray.engine import Crawler

    corpus, seeds, cfg, stash, golden = crawled
    ckpt = os.path.join(stash, "fetched_round1")
    buckets = sorted(d for d in os.listdir(ckpt) if d.startswith("bucket="))
    victim = buckets[0]
    # simulate a crash mid-bucket: data present but no completion marker
    os.remove(os.path.join(ckpt, victim, "_SUCCESS"))

    c = Crawler(cfg(stash), ("parquet", corpus, 4), seeds=seeds)
    res = c.crawl()
    t = res.records_table()
    assert _key_rows(t) == _key_rows(golden), "resume must reproduce records"

    import pyarrow.parquet as pq

    m = pq.read_table(os.path.join(stash, "metrics.parquet")).to_pandas()
    assert int(m["fetched"].sum()) == 0, "re-walk is all cache hits (seen set)"
    v = int(victim.split("=")[1])
    assert set(m[m["rows"] > 0]["partition"]) <= {v}, \
        "only the crashed bucket may have done work this run"
    assert os.path.exists(os.path.join(ckpt, victim, "_SUCCESS")), \
        "re-walk must restore the marker"
    c.shutdown()


def test_fully_resumed_run_does_no_work(crawled):
    from upton_ray.engine import Crawler

    corpus, seeds, cfg, stash, golden = crawled
    c = Crawler(cfg(stash), ("parquet", corpus, 4), seeds=seeds)
    res = c.crawl()
    assert _key_rows(res.records_table()) == _key_rows(golden)
    import pyarrow.parquet as pq

    m = pq.read_table(os.path.join(stash, "metrics.parquet")).to_pandas()
    assert len(m) == 0 or int(m["rows"].sum()) == 0
    c.shutdown()


def test_repeated_crash_resume_never_duplicates(crawled, tmp_path):
    """Regression guard for the once-observed exact-2x duplicated write on a
    resume run: crash (marker removed / partial bucket dir) before EVERY
    bucket in turn, resume each time, and assert the written output always
    has distinct_keys == records — a _SUCCESS-marked bucket must never
    re-emit its rows alongside the checkpoint read."""
    import pyarrow.parquet as pq

    from upton_ray import sinks
    from upton_ray.engine import Crawler

    corpus, seeds, cfg, stash_orig, golden = crawled
    stash = str(tmp_path / "stash")
    shutil.copytree(stash_orig, stash)
    ckpt = os.path.join(stash, "fetched_round1")
    buckets = sorted(d for d in os.listdir(ckpt) if d.startswith("bucket="))
    golden_keys = sorted(_key_rows(golden))

    for i, victim in enumerate(buckets):
        if i % 2 == 0:
            # crash between data write and marker write
            os.remove(os.path.join(ckpt, victim, "_SUCCESS"))
        else:
            # crash before the bucket wrote anything
            shutil.rmtree(os.path.join(ckpt, victim))
        c = Crawler(cfg(stash), ("parquet", corpus, 4), seeds=seeds)
        res = c.crawl()
        out = str(tmp_path / f"out-{i}")
        sinks.write_records_parquet(res.records, out)
        t = pq.read_table(out)
        keys = [(a, b, r) for a, b, r in zip(
            t["instance_index"].to_pylist(),
            t["pagination_index"].to_pylist(),
            t["row_no"].to_pylist())]
        assert len(keys) == len(set(keys)) == len(golden_keys), \
            f"resume {i} (victim {victim}) duplicated or lost rows"
        assert sorted(_key_rows(t)) == golden_keys
        m = pq.read_table(os.path.join(stash, "metrics.parquet")).to_pandas()
        v = int(victim.split("=")[1])
        assert set(m[m["rows"] > 0]["partition"]) <= {v}, \
            "a _SUCCESS-marked bucket re-emitted rows during resume"
        c.shutdown()


def test_checkpoint_carries_stash_key(crawled):
    """Each checkpointed page row carries the reference's stash filename
    (downloader.rb:122-139): md5(url).html by default."""
    import pyarrow.parquet as pq

    from upton_ray.urlops import md5_hash

    _, _, _, stash, _ = crawled
    ckpt = os.path.join(stash, "fetched_round1")
    d = sorted(x for x in os.listdir(ckpt) if x.startswith("bucket="))[0]
    t = pq.read_table(os.path.join(ckpt, d, "data-0.parquet"))
    assert "stash_key" in t.column_names
    urls = t["instance_url"].to_pylist()
    keys = t["stash_key"].to_pylist()
    assert keys == [md5_hash(u) + ".html" for u in urls]


def test_checkpoint_readable_filenames(ray_session, tmp_path, crawled):
    """cfg.readable_filenames switches the checkpoint stash_key to the
    sanitized human-readable form (downloader.rb:131-139) and the crawl
    output is unchanged."""
    import pyarrow.parquet as pq

    from upton_ray.engine import Crawler
    from upton_ray.urlops import readable_filename

    corpus, seeds, cfg, _, golden = crawled
    stash2 = str(tmp_path / "stash_readable")
    c2cfg = cfg(stash2)
    c2cfg.readable_filenames = True
    c = Crawler(c2cfg, ("parquet", corpus, 4), seeds=seeds)
    t = c.crawl().records_table()
    c.shutdown()
    assert _key_rows(t) == _key_rows(golden)
    ckpt = os.path.join(stash2, "fetched_round1")
    d = sorted(x for x in os.listdir(ckpt) if x.startswith("bucket="))[0]
    tk = pq.read_table(os.path.join(ckpt, d, "data-0.parquet"))
    urls = tk["instance_url"].to_pylist()
    keys = tk["stash_key"].to_pylist()
    assert keys == [readable_filename(u, stash2) for u in urls]
    assert all(k.endswith(".html") for k in keys)


def test_connected_components_crash_resume(ray_session, tmp_path):
    """Iterative-op crash resume (VERDICT r4 item 10): kill the BSP loop
    between supersteps, resume from the label checkpoint, and get labels
    identical to an uninterrupted run — the iterative analog of the
    crawl's bucket-granular restart."""
    import pyarrow as pa
    import pytest as _pytest

    from upton_ray import datapipe

    sf = "/root/testdata/sf0.001"

    def rows(ds):
        t = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return list(zip(t["doc_id"], t["label"]))

    golden = rows(datapipe.connected_components(sf, num_partitions=4))

    ckpt = str(tmp_path / "cc_labels")
    with _pytest.raises(RuntimeError, match="injected crash"):
        datapipe.connected_components(sf, num_partitions=4,
                                      label_checkpoint=ckpt,
                                      _crash_after=2)
    # the crash left complete superstep checkpoints behind
    done = sorted(d for d in os.listdir(ckpt)
                  if os.path.exists(os.path.join(ckpt, d, "_SUCCESS")))
    assert done == ["step-00000", "step-00001"]

    resumed = datapipe.connected_components(sf, num_partitions=4,
                                            label_checkpoint=ckpt)
    assert rows(resumed) == golden
    # the resumed run continued PAST the crash point (appended steps),
    # it did not restart from superstep 0
    after = sorted(d for d in os.listdir(ckpt)
                   if os.path.exists(os.path.join(ckpt, d, "_SUCCESS")))
    assert after[0] == "step-00000" and len(after) > 2
    assert after[2] == "step-00002"

    # partition-count mismatch is refused loudly, never silently rerun
    with _pytest.raises(ValueError, match="partitions"):
        datapipe.connected_components(sf, num_partitions=8,
                                      label_checkpoint=ckpt)
