"""Unit tests for the training-data operators: synthetic near-duplicates give
non-vacuous coverage for the dedup/similarity family (the testdata corpus has
none at high thresholds)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from upton_ray import datapipe


def _collect(ds, *cols_types) -> pa.Table:
    from upton_ray.engine import collect

    return collect(ds, pa.schema(list(cols_types)))


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """A tiny corpus with planted exact dups, near-dups, and distinct docs."""
    d = tmp_path_factory.mktemp("dupes")
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    near = base.replace("deep dark forest", "deep dark cave")   # high jaccard
    far = "completely different content about databases and query engines here"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, "  " + base.upper() + "  ", near, far,
                          "tiny doc"], pa.string()),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["src0", "src0", "src1", "src1", "src2"]),
        "n_chars": pa.array([len(base)] * 5, pa.int64()),
    })
    pq.write_table(docs, d / "documents.parquet")

    rng = np.random.RandomState(7)
    vecs = rng.randn(6, 16).astype(np.float32)
    vecs[1] = vecs[0] + 0.001 * rng.randn(16).astype(np.float32)  # near-dup pair
    emb = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 6, pa.int32()),
    })
    pq.write_table(emb, d / "embeddings.parquet")
    return str(d)


def test_dedup_exact_normalizes_case_and_whitespace(ray_session, dup_dir):
    t = _collect(datapipe.dedup_exact(dup_dir),
                 ("fp", pa.string()), ("doc_id", pa.int64()))
    # doc 0 and doc 1 share a fingerprint (lower+collapse) -> winner doc 0
    assert t.num_rows == 4
    winners = set(t["doc_id"].to_pylist())
    assert 0 in winners and 1 not in winners


def test_minhash_finds_planted_near_dup(ray_session, dup_dir):
    t = datapipe.minhash_dedup(dup_dir, threshold=0.5)
    pairs = set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    assert (0, 2) in pairs or (0, 1) in pairs
    assert (0, 2) in pairs            # the deliberate near-dup
    assert all(j >= 0.5 for j in t["jacc"].to_pylist())


def test_simhash_near_dup_small_hamming(ray_session, dup_dir):
    t = _collect(datapipe.simhash(dup_dir),
                 ("doc_id", pa.int64()), ("simhash_hex", pa.string()))
    h = {i: int(s, 16) for i, s in zip(t["doc_id"].to_pylist(),
                                       t["simhash_hex"].to_pylist())}
    d_near = bin(h[0] ^ h[2]).count("1")
    d_far = bin(h[0] ^ h[3]).count("1")
    assert h[0] == h[1]               # identical after normalization
    assert d_near < d_far             # near-dup is closer than unrelated doc


def test_embedding_dedup_finds_planted_pair(ray_session, dup_dir):
    t = datapipe.embedding_dedup(dup_dir, threshold=0.99)
    pairs = set(zip(t["vec_a"].to_pylist(), t["vec_b"].to_pylist()))
    assert pairs == {(0, 1)}


def test_ann_topk_self_is_rank1(ray_session, dup_dir):
    t = datapipe.ann_topk(dup_dir, n_queries=2, k=3)
    df = t.to_pandas()
    r1 = df[df["rank"] == 1].set_index("query_id")["vec_id"]
    assert r1.loc[0] == 0 and r1.loc[1] == 1
    # query 0's 2nd neighbor must be its planted near-dup
    r2 = df[(df["query_id"] == 0) & (df["rank"] == 2)]["vec_id"].iloc[0]
    assert r2 == 1


def test_lang_id_cjk_and_und(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the cat and the dog is here",
                          "漢字 text with cjk",
                          "xyzzy plugh"], pa.string()),
        "lang": pa.array(["en", "zh", "xx"]),
        "source": pa.array(["src0"] * 3),
        "n_chars": pa.array([1, 1, 1], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = _collect(datapipe.lang_id(str(tmp_path)),
                 ("doc_id", pa.int64()), ("pred_lang", pa.string()))
    got = dict(zip(t["doc_id"].to_pylist(), t["pred_lang"].to_pylist()))
    assert got == {0: "en", 1: "zh", 2: "und"}


def test_media_decoder_deterministic():
    d1 = datapipe.MediaDecoder._decode("assets/42.img")
    d2 = datapipe.MediaDecoder._decode("assets/42.img")
    assert d1 == d2
    assert 64 <= d1[0] < 512 and 64 <= d1[1] < 512


def test_ngram_jaccard_exact_blocked_pairs(ray_session, dup_dir):
    t = datapipe.ngram_jaccard(dup_dir, threshold=0.5)
    pairs = list(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    # within-source blocking: (0,1) are normalized-identical in src0 -> 1.0;
    # src1's near-dup pair (2,3) is far below threshold; src2 has one doc
    assert pairs == [(0, 1)]
    assert t["jacc"].to_pylist() == [1.0]


def test_ngram_jaccard_threshold_zero_emits_all_block_pairs(ray_session, dup_dir):
    t = datapipe.ngram_jaccard(dup_dir, threshold=0.0)
    assert set(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())) == \
        {(0, 1), (2, 3)}


def test_ann_ivf_full_probe_equals_brute_force(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = datapipe.ann_topk(sf).to_pandas()
    ivf = datapipe.ann_ivf(sf, n_cells=8, nprobe=8).to_pandas()
    # probing every cell must reduce IVF to exact brute force, bit-for-bit
    assert ivf.values.tolist() == exact.values.tolist()


def test_ann_lsh_multiprobe_really_multiprobes(ray_session):
    """ADVICE r4: n_flip used to act as a boolean.  Now n_flip=b (Hamming
    ball = the whole key space) must degrade LSH to exact brute force, and
    widening the ball must never lose a true neighbor that a narrower one
    found (candidate sets are supersets)."""
    sf = "/root/testdata/sf0.001"
    exact = datapipe.ann_topk(sf).to_pandas()
    full = datapipe.ann_lsh(sf, n_bands=2, band_bits=6, n_flip=6).to_pandas()
    assert full.values.tolist() == exact.values.tolist(), \
        "probing the whole Hamming ball must equal brute force bit-for-bit"

    truth = {q: set(g["vec_id"]) for q, g in exact.groupby("query_id")}

    def recall(df):
        return sum(len(set(g["vec_id"]) & truth[q]) / len(truth[q])
                   for q, g in df.groupby("query_id")) / len(truth)

    r1 = recall(datapipe.ann_lsh(sf, n_bands=2, band_bits=8,
                                 n_flip=1).to_pandas())
    r2 = recall(datapipe.ann_lsh(sf, n_bands=2, band_bits=8,
                                 n_flip=2).to_pandas())
    assert r2 >= r1, (r1, r2)


def test_ann_recall_gate_pins_floors(ray_session):
    """The self-asserting recall gate (VERDICT r3 item 5): every approximate
    ANN entry clears its pinned floor, full-probe IVF is exactly 1.0, and
    the output table carries the measured numbers."""
    t = datapipe.ann_recall("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 6
    assert "ann_lsh_16x10_probe1" in set(t["method"])
    assert (t["recall_at_k"] >= t["floor"]).all()
    full = t[t["method"] == "ann_ivf_full_probe"]
    assert full["recall_at_k"].iloc[0] == 1.0


def test_ann_ivf_partial_probe_recall(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = datapipe.ann_topk(sf).to_pandas()
    ivf = datapipe.ann_ivf(sf, n_cells=8, nprobe=4).to_pandas()
    hits = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        hits += len(truth & got) / len(truth)
    recall = hits / exact["query_id"].nunique()
    assert recall >= 0.5, f"IVF nprobe=4/8 recall too low: {recall}"


def test_winnowing_guarantee_and_stability():
    """Winnowing property: every window of w consecutive k-gram hashes
    contributes a selected fingerprint, and matches of length >= w+k-1
    between two docs share at least one fingerprint."""
    from upton_ray.datapipe import rolling_kgram_hashes, winnow

    text = "the quick brown fox jumps over the lazy dog again and again"
    h = rolling_kgram_hashes(text, k=8)
    sel = set(winnow(h, w=4).tolist())
    wins = np.lib.stride_tricks.sliding_window_view(h, 4)
    assert all(any(int(v) in sel for v in win) for win in wins)

    # a long shared substring yields shared fingerprints
    other = "XYZ " + text[4:40] + " QQQ totally different tail here now"
    sel2 = set(winnow(rolling_kgram_hashes(other, k=8), w=4).tolist())
    assert sel & sel2, "long shared substring must share a fingerprint"


def test_winnow_fingerprint_pipeline(ray_session, dup_dir):
    t = _collect(datapipe.winnow_fingerprint(dup_dir),
                 ("doc_id", pa.int64()), ("n_fp", pa.int64()),
                 ("fp_min", pa.int64()), ("fp_max", pa.int64()),
                 ("fp_xor", pa.int64())).sort_by("doc_id")
    assert t.num_rows == 5
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    # docs 0 and 1 are normalization-identical -> identical sketches
    assert (rows[0]["n_fp"], rows[0]["fp_xor"]) == \
        (rows[1]["n_fp"], rows[1]["fp_xor"])
    assert rows[0]["fp_xor"] != rows[3]["fp_xor"]


def test_sessionize_gap_semantics(ray_session, tmp_path):
    """Planted event stream: gaps > 30 min split sessions; boundary gap of
    exactly 30 min does NOT split (strict >)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 7, 1.0),
        (1, base + dt.timedelta(minutes=30), 7, 2.0),   # ==30min: same session
        (2, base + dt.timedelta(minutes=61), 7, 4.0),   # 31min gap: new session
        (3, base + dt.timedelta(minutes=62), 8, 8.0),   # other user
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = _collect(datapipe.sessionize(str(tmp_path)),
                   ("user_id", pa.int64()), ("session_id", pa.int64()),
                   ("n_events", pa.int64()),
                   ("session_start", pa.timestamp("us")),
                   ("session_end", pa.timestamp("us")),
                   ("sum_value", pa.float64()))
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
           for r in out.to_pylist()}
    assert got == {(7, 0): (2, 3.0), (7, 1): (1, 4.0), (8, 0): (1, 8.0)}


def test_crawl_bfs_min_depth(ray_session):
    df = datapipe.crawl_bfs("/root/testdata/sf0.001").to_pandas()
    d = dict(zip(df["doc_id"], df["depth"]))
    assert d[0] == 0 and d[1] == 0 and d[2] == 0
    # children of seed 1 -> depth 1; grandchildren -> depth 2
    assert d[4] == 1 and d[3*4+1] == 2
    # doc 7 is reachable as 3*2+1 (depth 1); min-depth wins over longer paths
    assert d[7] == 1
    # closure covers every existing doc in this corpus
    assert len(d) == 500
    assert all(0 <= v <= 8 for v in d.values())


def test_embedding_dedup_lsh_matches_exact(ray_session, dup_dir):
    exact = datapipe.embedding_dedup(dup_dir)
    lsh = datapipe.embedding_dedup_lsh(dup_dir)
    pairs = set(zip(lsh["vec_a"].to_pylist(), lsh["vec_b"].to_pylist()))
    expect = set(zip(exact["vec_a"].to_pylist(), exact["vec_b"].to_pylist()))
    assert pairs == expect and (0, 1) in pairs, \
        "LSH must find the planted near-dup and nothing spurious"


def test_events_sliding_fanout(ray_session, tmp_path):
    """Each event lands in exactly the two hop windows covering it."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 30)
    t = pa.table({
        "event_id": pa.array([0], pa.int64()),
        "ts": pa.array([base], pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["x"]),
        "value": pa.array([2.5], pa.float64()),
        "props": pa.array(["{}"]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = _collect(datapipe.events_sliding(str(tmp_path)),
                   ("event_type", pa.string()),
                   ("window_start", pa.timestamp("us")),
                   ("n_events", pa.int64()), ("sum_value", pa.float64()))
    rows = sorted((r["window_start"].hour, r["n_events"], r["sum_value"])
                  for r in out.to_pylist())
    assert rows == [(9, 1, 2.5), (10, 1, 2.5)]


def test_hll_accuracy_and_merge():
    from upton_ray.datapipe import HyperLogLog
    import pandas as pd_

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 10_000_000, size=60_000)
    true = len(np.unique(vals))
    h = pd_.util.hash_array(vals.astype(np.int64), categorize=False)
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_hashes(h[:30_000]); b.add_hashes(h[30_000:])
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - true) / true < 0.05, f"HLL error too high: {est} vs {true}"


def test_approx_distinct_users_close_to_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    import duckdb

    true = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    est = datapipe.approx_distinct_users(sf)["approx_distinct"][0].as_py()
    assert abs(est - true) / true < 0.05, f"{est} vs exact {true}"


def test_value_quantiles_exact(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    t = datapipe.value_quantiles(sf)
    exact = duckdb.sql(
        f"WITH a AS (SELECT quantile_cont(value, [0.25,0.5,0.9,0.99]) v "
        f"FROM '{sf}/events.parquet') SELECT unnest(v) FROM a").fetchall()
    assert t["val"].to_pylist() == [r[0] for r in exact], \
        "two-pass quantiles must be bit-identical to a full sort"


def test_asof_join_semantics(ray_session, tmp_path):
    """Planted stream: each purchase matches the latest click at-or-before
    its ts for the same user; ties on click ts resolve to the lowest
    event_id; purchases with no prior click are dropped (inner as-of)."""
    import datetime as dt

    b = dt.datetime(2024, 1, 1)
    rows = [  # (event_id, minutes, user, type)
        (0, 0, 1, "click"), (1, 0, 1, "click"),      # tie at t0 -> id 0 wins
        (2, 5, 1, "purchase"),                        # matches t0 click id 0
        (3, 10, 1, "click"),
        (4, 10, 1, "purchase"),                       # at-or-before: id 3
        (5, 1, 2, "purchase"),                        # user 2: no click -> drop
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([b + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = datapipe.asof_join_events(str(tmp_path))
    got = {r["event_id"]: r["matched_event_id"] for r in out.to_pylist()}
    assert got == {2: 0, 4: 3}


def test_term_frequencies_partition_topk_is_exact(ray_session, dup_dir):
    """Per-partition top-k before the driver merge loses nothing: terms are
    hash-partitioned by the groupby, so each term's GLOBAL count lives in one
    partition and the global top-k ⊆ union of per-partition top-k's."""
    import collections

    t = datapipe.term_frequencies(dup_dir, k=5)
    texts = pq.read_table(f"{dup_dir}/documents.parquet")["text"].to_pylist()
    c = collections.Counter()
    for x in texts:
        c.update(" ".join(x.lower().split()).split())
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(t["term"].to_pylist(), t["n"].to_pylist()))
    assert got == expect
    assert t["rank"].to_pylist() == [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """300 identical docs + 300 identical embeddings: every LSH bucket is one
    giant cluster — the quadratic-blowup worst case the bucket cap bounds."""
    d = tmp_path_factory.mktemp("degen")
    n = 300
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["same exact text for every single document here"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["src0"] * n),
        "n_chars": pa.array([46] * n, pa.int64()),
    })
    pq.write_table(docs, d / "documents.parquet")
    v = np.random.RandomState(3).randn(16).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v))] * n, pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    pq.write_table(emb, d / "embeddings.parquet")
    return str(d)


def test_minhash_bucket_cap_bounds_degenerate_corpus(ray_session, degenerate_dir):
    """With the cap, an all-identical corpus emits ZERO pairs from oversized
    buckets (dropped + logged) instead of O(n^2) per band; with the cap above
    the cluster size, the full pair set comes back."""
    capped = datapipe.minhash_dedup(degenerate_dir, threshold=0.5, max_bucket=16)
    assert capped.num_rows == 0
    full = datapipe.minhash_dedup(degenerate_dir, threshold=0.5, max_bucket=1024)
    assert full.num_rows == 300 * 299 // 2


def test_embedding_lsh_bucket_cap_bounds_degenerate_corpus(
        ray_session, degenerate_dir):
    capped = datapipe.embedding_dedup_lsh(degenerate_dir, max_bucket=16)
    assert capped.num_rows == 0
    full = datapipe.embedding_dedup_lsh(degenerate_dir, max_bucket=1024)
    assert full.num_rows == 300 * 299 // 2


def test_media_decoder_injection_seam(ray_session, dup_dir):
    """A non-fake decoder drops in via fn_constructor_kwargs with ZERO
    pipeline changes — the media stubs' production-shape claim."""
    import ray

    def _bytes_header_decoder(ref: str) -> tuple[int, int]:
        # stand-in for a real PIL/ffprobe decoder: derives dimensions from a
        # 'header' (first bytes of the ref) the way a real probe reads a file
        # header — deliberately a different algorithm from the built-in fake
        # (nested def: cloudpickle ships it by value into the actors)
        h = sum(ref.encode()[:4])
        return 100 + h % 50, 200 + h % 25

    ds = datapipe._media_refs_ds(dup_dir).map_batches(
        datapipe.MediaDecoder, batch_format="pyarrow", concurrency=2,
        batch_size=4096, fn_constructor_kwargs={"decode_fn": _bytes_header_decoder})
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    refs = t["media_ref"].to_pylist()
    expect = [_bytes_header_decoder(r) for r in refs]
    assert t["width"].to_pylist() == [e[0] for e in expect]
    assert t["height"].to_pylist() == [e[1] for e in expect]
    assert t["n_pixels"].to_pylist() == [e[0] * e[1] for e in expect]


def test_frame_sampler_injection_seam(ray_session, dup_dir):
    import ray

    ds = datapipe._media_refs_ds(dup_dir).map_batches(
        datapipe.FrameSampler, batch_format="pyarrow", concurrency=2,
        batch_size=4096, fn_constructor_kwargs={"duration_fn": lambda r: 25})
    t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    # 25 s at 10 s step -> frames at t = 0, 10, 20 for every doc
    per_doc = t.to_pandas().groupby("doc_id")["t_s"].apply(list).to_dict()
    assert all(v == [0, 10, 20] for v in per_doc.values())


def test_redact_pii_planted(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "contact alice.smith+spam@mail-host.example.org now",
            "call 555-123-4567 or +1 555 987 6543 today",
            "no pii here at all",
        ]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["src0"] * 3),
        "n_chars": pa.array([1, 1, 1], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = _collect(datapipe.redact_pii(str(tmp_path)),
                 ("doc_id", pa.int64()), ("text_redacted", pa.string()),
                 ("n_emails", pa.int64()), ("n_phones", pa.int64())) \
        .sort_by("doc_id")
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[0]["text_redacted"] == "contact <EMAIL> now"
    assert rows[0]["n_emails"] == 1
    # "+1 555 987 6543" matches on its trailing "555 987 6543" window
    assert rows[1]["text_redacted"] == "call <PHONE> or +1 <PHONE> today"
    assert rows[1]["n_phones"] == 2
    assert rows[2]["text_redacted"] == "no pii here at all"


def test_dedup_keep_best_prefers_longest_then_lowest_id(ray_session, dup_dir):
    t = _collect(datapipe.dedup_keep_best(dup_dir),
                 ("fp", pa.string()), ("doc_id", pa.int64()),
                 ("n_chars", pa.int64()))
    # docs 0 and 1 share a fingerprint; doc 1 has the LONGER raw text
    # ("  " + upper + "  ") so it wins — the opposite of dedup_exact's
    # first-wins, which is the point
    winners = set(t["doc_id"].to_pylist())
    assert 1 in winners and 0 not in winners
    assert t.num_rows == 4


def test_ann_range_search_finds_planted_pair(ray_session, dup_dir):
    t = datapipe.ann_range_search(dup_dir, n_queries=2, threshold=0.95)
    pairs = set(zip(t["query_id"].to_pylist(), t["vec_id"].to_pylist()))
    # each query matches itself, and queries 0/1 are planted near-dups
    assert {(0, 0), (0, 1), (1, 0), (1, 1)} <= pairs


def test_doc_length_histogram_buckets(ray_session, dup_dir):
    t = _collect(datapipe.doc_length_histogram(dup_dir),
                 ("bucket", pa.int64()), ("lo", pa.int64()),
                 ("hi", pa.int64()), ("n_docs", pa.int64()))
    assert sum(t["n_docs"].to_pylist()) == 5
    for r in t.to_pylist():
        assert r["hi"] - r["lo"] == 100 and r["lo"] == r["bucket"] * 100


def test_sample_stratified_balances_skew(ray_session, tmp_path):
    """Skewed strata: the big source downsamples toward the target, the
    small one keeps everything; the sample is deterministic."""
    n_big, n_small = 400, 10
    docs = pa.table({
        "doc_id": pa.array(range(n_big + n_small), pa.int64()),
        "text": pa.array(["x"] * (n_big + n_small)),
        "lang": pa.array(["en"] * (n_big + n_small)),
        "source": pa.array(["src0"] * n_big + ["src1"] * n_small),
        "n_chars": pa.array([1] * (n_big + n_small), pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = _collect(datapipe.sample_stratified(str(tmp_path), target_per_stratum=40),
                 ("doc_id", pa.int64()), ("source", pa.string()))
    by_src = t.to_pandas().groupby("source").size().to_dict()
    assert by_src["src1"] == n_small            # rate 1.0: all kept
    assert 15 <= by_src.get("src0", 0) <= 70    # ~40 expected, binomial spread
    t2 = _collect(datapipe.sample_stratified(str(tmp_path), target_per_stratum=40),
                  ("doc_id", pa.int64()), ("source", pa.string()))
    assert sorted(t["doc_id"].to_pylist()) == sorted(t2["doc_id"].to_pylist())


def test_dedup_clusters_transitive_closure(ray_session, tmp_path):
    """A-B and B-C near-dups (A-C below threshold pairwise via B) must land
    in ONE cluster labeled by the smallest doc_id — the property pair lists
    alone don't give you."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    mid = base.replace("theta", "thetaX")            # near A
    far = mid.replace("alpha beta", "alphaY betaY")  # near B, farther from A
    other = "entirely different words in this unrelated document here now"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([base, mid, far, other]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["src0"] * 4),
        "n_chars": pa.array([len(base)] * 4, pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = datapipe.dedup_clusters(str(tmp_path), threshold=0.5)
    got = dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))
    assert got.get(0) == 0 and got.get(1) == 0 and got.get(2) == 0, got
    assert 3 not in got                    # singleton: not in any pair


def test_dedup_filter_keeps_cluster_representative(ray_session, tmp_path):
    """dedup_filter drops every clustered doc except the min-id rep: the A-B-C
    transitive cluster collapses to A; the singleton survives untouched."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    mid = base.replace("theta", "thetaX")
    far = mid.replace("alpha beta", "alphaY betaY")
    other = "entirely different words in this unrelated document here now"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([base, mid, far, other]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["src0"] * 4),
        "n_chars": pa.array([len(base)] * 4, pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = _collect(datapipe.dedup_filter(str(tmp_path), threshold=0.5),
                 ("doc_id", pa.int64()), ("source", pa.string()),
                 ("n_chars", pa.int64()))
    assert sorted(t["doc_id"].to_pylist()) == [0, 3]


def _mini_docs(tmp_path, texts):
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")


def test_repetition_score_gopher_gates(ray_session, tmp_path):
    """'a a a a' -> 2 identical 3-grams (dup 1/2, top 2/2); 'a b c d' ->
    2 distinct 3-grams (dup 0, top 1/2); short docs score 0/0."""
    _mini_docs(tmp_path, ["a a a a", "a b c d", "too short"])
    t = _collect(datapipe.repetition_score(str(tmp_path)),
                 ("doc_id", pa.int64()), ("dup_ppm", pa.int64()),
                 ("top_ppm", pa.int64())).sort_by("doc_id")
    assert t["dup_ppm"].to_pylist() == [500000, 0, 0]
    assert t["top_ppm"].to_pylist() == [1000000, 500000, 0]


def test_dup_ngrams_cross_doc(ray_session, tmp_path):
    """A 5-gram shared by docs 0 and 1 (df=2) surfaces; within-doc repeats
    don't inflate df (per-doc distinct); unique grams (df=1) are dropped."""
    shared = "one two three four five"
    _mini_docs(tmp_path, [
        shared + " tail0 " + shared,          # shared gram twice in doc 0
        "head1 " + shared + " tail1",
        "totally different words here now six seven eight nine ten"])
    t = datapipe.dup_ngrams(str(tmp_path))
    got = dict(zip(t["gram"].to_pylist(), t["df"].to_pylist()))
    assert got[shared] == 2
    assert all(df >= 2 for df in got.values())


def test_sequence_pack_prefix_sum(ray_session, tmp_path):
    """Exclusive-prefix packing at budget=512: token counts 200,200,200,512
    -> prefixes 0,200,400,600 -> seqs 0,0,0,1."""
    _mini_docs(tmp_path, ["w " * 200, "x " * 200, "y " * 200, "z " * 512])
    t = _collect(datapipe.sequence_pack(str(tmp_path)),
                 ("doc_id", pa.int64()), ("n_tok", pa.int64()),
                 ("seq_id", pa.int64())).sort_by("doc_id")
    assert t["n_tok"].to_pylist() == [200, 200, 200, 512]
    assert t["seq_id"].to_pylist() == [0, 0, 0, 1]


def test_pagerank_matches_dense_reference(ray_session, tmp_path):
    """Distributed PageRank == a dense single-process power iteration on the
    same graph (kids 3d+1..3d+3 + backlink d//2, ids NOT contiguous so the
    membership gate is exercised), iteration-for-iteration."""
    ids = [0, 1, 2, 3, 4, 5, 7, 10, 16, 31]      # gaps: 6, 8, 9 missing
    _mini_docs(tmp_path, ["doc"] * len(ids))
    t = pq.read_table(tmp_path / "documents.parquet")
    t = t.set_column(0, "doc_id", pa.array(ids, pa.int64()))
    pq.write_table(t, tmp_path / "documents.parquet")

    idset, n, damp = set(ids), len(ids), 0.85
    r = {i: 1.0 / n for i in ids}
    for _ in range(5):
        out = {i: [] for i in ids}
        for u in ids:
            tgts = [v for v in (3 * u + 1, 3 * u + 2, 3 * u + 3)
                    if v in idset]
            if u >= 1 and u // 2 in idset:
                tgts.append(u // 2)
            for v in tgts:
                out[v].append(damp * r[u] / len(tgts))
        r = {i: round((1 - damp) / n + sum(out[i]), 12) for i in ids}

    got = _collect(datapipe.pagerank(str(tmp_path)),
                   ("doc_id", pa.int64()), ("pr", pa.float64()))
    got = dict(zip(got["doc_id"].to_pylist(), got["pr"].to_pylist()))
    assert set(got) == idset
    for i in ids:
        assert got[i] == pytest.approx(round(r[i], 6), abs=2e-6), i
    # backlink hub 1 (sources 2,3 + parent 0) outranks leaf 31
    assert got[1] > got[31]


def test_q3_top_orders_against_python_reference(ray_session, tmp_path):
    """The three-way join (broadcast customer semi-join + sort-segment
    orders x lineitem-agg) matches a brute-force reference, including
    e4 revenue quantization and the (rev desc, date, key) tiebreak."""
    import datetime
    rng = np.random.RandomState(7)
    n_cust, n_ord = 10, 40
    seg = ["BUILDING" if i % 2 == 0 else "AUTOMOBILE" for i in range(n_cust)]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array([0] * n_cust, pa.int32()),
        "c_acctbal": pa.array([0.0] * n_cust),
        "c_mktsegment": pa.array(seg)}), tmp_path / "customer.parquet")
    odate = [datetime.datetime(1995, 3, 1 + int(i % 28)) for i in range(n_ord)]
    ocust = rng.randint(0, n_cust, n_ord)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(ocust, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_ord),
        "o_totalprice": pa.array([0.0] * n_ord),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array([f"p{i % 3}" for i in range(n_ord)])}),
        tmp_path / "orders.parquet")
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), 3)
    price = np.round(rng.uniform(10, 1000, len(lkey)), 2)
    disc = np.round(rng.choice([0.0, 0.05, 0.1], len(lkey)), 2)
    sdate = [datetime.datetime(1995, 3, 1 + int(x))
             for x in rng.randint(0, 28, len(lkey))]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(np.zeros(len(lkey), np.int64)),
        "l_suppkey": pa.array(np.zeros(len(lkey), np.int64)),
        "l_linenumber": pa.array(np.zeros(len(lkey), np.int32), pa.int32()),
        "l_quantity": pa.array(np.ones(len(lkey))),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(disc),
        "l_tax": pa.array(np.zeros(len(lkey))),
        "l_returnflag": pa.array(["N"] * len(lkey)),
        "l_linestatus": pa.array(["O"] * len(lkey)),
        "l_shipdate": pa.array(sdate, pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")

    cut = datetime.datetime(1995, 3, 15)
    rev = {}
    for j, okey in enumerate(lkey):
        if sdate[j] > cut:
            rev[okey] = rev.get(okey, 0.0) + price[j] * (1 - disc[j])
    rows = []
    for o in range(n_ord):
        if (seg[ocust[o]] == "BUILDING" and odate[o] < cut and o in rev):
            rows.append((int(round(rev[o] * 10000)), odate[o], o))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    expect = [(o, r) for r, _, o in rows[:10]]

    t = datapipe.q3_top_orders(str(tmp_path))
    got = list(zip(t["o_orderkey"].to_pylist(), t["revenue_e4"].to_pylist()))
    assert got == expect


def test_tfidf_top_term_prefers_rare_terms(ray_session, tmp_path):
    """'common' appears in every doc (df=3 -> low idf); each doc's unique
    term wins despite tf parity; ties break to the smaller term."""
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["common zebra common", "common yak common",
                          "common common xenon"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["src0"] * 3),
        "n_chars": pa.array([1] * 3, pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    t = _collect(datapipe.tfidf_top_term(str(tmp_path)),
                 ("doc_id", pa.int64()), ("top_term", pa.string()),
                 ("score", pa.int64())).sort_by("doc_id")
    got = dict(zip(t["doc_id"].to_pylist(), t["top_term"].to_pylist()))
    assert got == {0: "zebra", 1: "yak", 2: "xenon"}
    # score = tf * ((n_docs*1000)//df) = 1 * (3000//1) = 3000 for the uniques
    assert set(t["score"].to_pylist()) == {3000}


def test_ann_pq_recall_vs_brute(ray_session):
    """PQ is lossy by design; with the 16x64 default codebooks on 64-dim
    vectors, recall@10 against brute force must clear a floor and the
    output must be deterministic."""
    sf = "/root/testdata/sf0.001"
    exact = datapipe.ann_topk(sf).to_pandas()
    pq_res = datapipe.ann_pq(sf).to_pandas()
    hits = 0.0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["vec_id"])
        got = set(pq_res[pq_res["query_id"] == qid]["vec_id"])
        hits += len(truth & got) / len(truth)
    recall = hits / exact["query_id"].nunique()
    assert recall >= 0.5, f"PQ recall@10 too low: {recall}"
    # determinism
    again = datapipe.ann_pq(sf).to_pandas()
    assert pq_res.values.tolist() == again.values.tolist()


# ------------------------------------------------ training-data extras (r3)


def test_doc_chunk_reconstructs_and_overlaps(ray_session):
    t = _collect(datapipe.doc_chunk("/root/testdata/sf0.001",
                                    size=16, stride=12),
                 ("doc_id", pa.int64()), ("chunk_no", pa.int64()),
                 ("chunk", pa.string()), ("n_tokens", pa.int64())).to_pandas()
    t = t.sort_values(["doc_id", "chunk_no"])
    for doc_id, g in list(t.groupby("doc_id"))[:50]:
        chunks = [c.split(" ") for c in g["chunk"]]
        # stitch: first stride tokens of every chunk + the tail of the last
        toks = []
        for c in chunks[:-1]:
            toks.extend(c[:12])
        toks.extend(chunks[-1])
        # consecutive chunks overlap by size - stride tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a[12:] == b[:len(a) - 12]
        assert (g["n_tokens"] == [len(c) for c in chunks]).all()
        assert toks == " ".join(
            sum([c[:12] for c in chunks[:-1]], []) + chunks[-1]).split(" ")


def test_seeded_shuffle_is_deterministic_permutation(ray_session):
    a = datapipe.seeded_shuffle("/root/testdata/sf0.001").to_pandas()
    b = datapipe.seeded_shuffle("/root/testdata/sf0.001").to_pandas()
    n = len(a)
    assert sorted(a["pos"]) == list(range(n))
    assert sorted(a["doc_id"]) == list(range(n))
    pd = a.sort_values("pos")["doc_id"].tolist()
    assert pd == b.sort_values("pos")["doc_id"].tolist(), "same seed, same order"
    assert pd != list(range(n)), "a shuffle must not be the identity"
    c = datapipe.seeded_shuffle("/root/testdata/sf0.001", seed=7).to_pandas()
    assert c.sort_values("pos")["doc_id"].tolist() != pd, \
        "different seed, different order"


def test_contamination_check_plants(ray_session, tmp_path):
    """A candidate doc that copies a benchmark doc verbatim is flagged with
    n_overlap == its distinct 3-gram count; clean docs report 0."""
    import pyarrow.parquet as pq

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    partial_text = "iota kappa alpha beta gamma lam mu nu xi"  # 1 shared gram
    clean_text = "one two three four five six seven"
    # modulus=211: doc_id 0 is the benchmark; 1, 2 are candidates
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([bench_text, bench_text, clean_text, partial_text]),
        "lang": pa.array(["en"] * 4), "source": pa.array(["src0"] * 4),
        "n_chars": pa.array([len(bench_text), len(bench_text),
                             len(clean_text), len(partial_text)], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = _collect(datapipe.contamination_check(str(tmp_path)),
                  ("doc_id", pa.int64()), ("n_overlap", pa.int64()),
                  ("contaminated", pa.bool_())).to_pandas() \
        .set_index("doc_id")
    n_grams = len(set(datapipe.shingles(bench_text, 3)))
    assert df.loc[1, "n_overlap"] == n_grams and df.loc[1, "contaminated"]
    assert df.loc[2, "n_overlap"] == 0 and not df.loc[2, "contaminated"]
    assert df.loc[3, "n_overlap"] == 1 and df.loc[3, "contaminated"]
    assert 0 not in df.index, "benchmark docs are not reported"


def test_semi_join_events_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id", "event_type", "value"]).to_pandas()
    users = set(ev.loc[(ev["event_type"] == "purchase")
                       & (ev["value"] > 190), "user_id"])
    gated = ev[ev["user_id"].isin(users)].copy()
    gated["cents"] = gated["value"].mul(100).round().astype(np.int64)
    want = gated.groupby("user_id") \
        .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
    got = _collect(datapipe.semi_join_events("/root/testdata/sf0.001"),
                   ("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("sum_cents", pa.int64())).to_pandas() \
        .set_index("user_id").sort_index()
    assert set(got.index) == users
    assert (got["n_events"] == want["n_events"]).all()
    assert (got["sum_cents"] == want["sum_cents"]).all()


def test_ann_pq_rerank_recall_and_exactness(ray_session):
    """Re-ranking makes the candidate stage the only recall limiter: at
    k_prime >= corpus size the output is EXACTLY brute force; at the default
    k_prime it must beat raw PQ's recall (the point of the composition)."""
    sf = "/root/testdata/sf0.001"
    truth = datapipe.ann_topk(sf).to_pandas()
    tsets = {q: set(g["vec_id"]) for q, g in truth.groupby("query_id")}

    full = datapipe.ann_pq_rerank(sf, k_prime=10_000).to_pandas()
    got = {q: list(g.sort_values("rank")["vec_id"])
           for q, g in full.groupby("query_id")}
    want = {q: list(g.sort_values("rank")["vec_id"])
            for q, g in truth.groupby("query_id")}
    assert got == want, "k_prime >= corpus must equal brute force exactly"

    def recall(df):
        return sum(len(set(g["vec_id"]) & tsets[q])
                   for q, g in df.groupby("query_id")) \
            / sum(len(s) for s in tsets.values())

    r_rerank = recall(datapipe.ann_pq_rerank(sf, k_prime=50).to_pandas())
    r_pq = recall(datapipe.ann_pq(sf).to_pandas())
    assert r_rerank >= max(r_pq, 0.7), (r_rerank, r_pq)


def test_kmeans_clusters_converges_and_matches_reference(ray_session):
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = datapipe.kmeans_clusters(sf, k=8, iters=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # single-process reference: identical deterministic Lloyd's
    t = pq.read_table(f"{sf}/embeddings.parquet")
    M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    C = M[:8].copy()
    inertias = []
    for _ in range(5):
        d2 = (M * M).sum(1)[:, None] - 2 * (M @ C.T) + (C * C).sum(1)[None]
        a = d2.argmin(1)
        inertias.append(float(d2[np.arange(len(M)), a].sum()))
        for c in range(8):
            if (a == c).any():
                C[c] = M[a == c].mean(0)
    d2 = (M * M).sum(1)[:, None] - 2 * (M @ C.T) + (C * C).sum(1)[None]
    a = d2.argmin(1)
    assert got["cluster_id"].tolist() == a.tolist()
    assert len(set(got["cluster_id"])) <= 8
    assert np.allclose(
        got["dist"], np.round(np.sqrt(d2[np.arange(len(M)), a]), 6),
        atol=1e-6)
    # Lloyd's monotonicity on the reference path
    assert all(b <= a_ + 1e-9 for a_, b in zip(inertias, inertias[1:]))
    # determinism of the distributed path
    again = datapipe.kmeans_clusters(sf, k=8, iters=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["cluster_id"].tolist() == again["cluster_id"].tolist()


def test_group_quantiles_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    got = datapipe.group_quantiles("/root/testdata/sf0.001").to_pandas()
    for _, r in got.iterrows():
        want = float(np.quantile(
            ev.loc[ev["event_type"] == r["event_type"], "value"], r["q"],
            method="linear"))
        assert abs(r["val"] - round(want, 6)) < 1e-9, r
    assert len(got) == 2 * ev["event_type"].nunique()


def test_approx_quantiles_relative_error(ray_session):
    import pyarrow.parquet as pq

    alpha = 0.005
    got = datapipe.approx_quantiles_sketch("/root/testdata/sf0.001",
                                           alpha=alpha).to_pandas()
    v = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["value"])["value"].to_numpy()
    for _, r in got.iterrows():
        # rank-nearest truth: the sketch targets the ceil(qn)-th order stat
        k = max(0, min(len(v) - 1, int(np.ceil(r["q"] * len(v))) - 1))
        truth = float(np.sort(v)[k])
        if truth == 0:
            assert r["val"] == 0
        else:
            assert abs(r["val"] - truth) / truth <= alpha + 1e-9, (r, truth)


def test_ntile_fill_matches_duckdb(ray_session):
    """NTILE bucket fill with a remainder: first total%k buckets get one
    extra row (the sf tables are divisible by 4, so the gate never hits
    this path)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from upton_ray.datapipe import _attach_ntile

    con = duckdb.connect()
    for total, k in [(10, 4), (7, 3), (8, 4), (5, 7)]:
        t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(total)]),
                      "n_chars": pa.array(np.arange(total)[::-1].copy(),
                                          pa.int64())})
        # two blocks to exercise the base offset
        cut = total // 2
        got = pa.concat_tables(_ray.get([
            _attach_ntile.remote(t.slice(0, cut), 0, total, k),
            _attach_ntile.remote(t.slice(cut), cut, total, k)]))
        exp = con.execute(
            f"SELECT NTILE({k}) OVER (ORDER BY n_chars DESC, doc_id) "
            "FROM t ORDER BY n_chars DESC, doc_id",
        ).fetchnumpy()
        assert got["tile"].to_numpy().tolist() == \
            list(exp[list(exp)[0]]), (total, k)


def test_connected_components_both_paths(ray_session):
    """Hash-min CC labels equal the residue-class minima, with and without
    pointer jumping (the two must agree exactly — shortcut only
    accelerates convergence, never changes the fixed point)."""
    import pyarrow as pa
    import ray as _ray

    from upton_ray.datapipe import connected_components

    outs = []
    for sc in (False, True):
        t = pa.concat_tables(_ray.get(connected_components(
            "/root/testdata/sf0.001", shortcut=sc).to_arrow_refs()))
        outs.append(dict(zip(t["doc_id"].to_pylist(),
                             t["label"].to_pylist())))
    assert outs[0] == outs[1]
    assert all(v == k % 25 for k, v in outs[0].items())


def test_connected_components_high_diameter_contract(ray_session, tmp_path):
    """The 1M-node holes-graph soak caught plain min-fold silently
    returning UNCONVERGED labels once diameter > max_iters.  Contract now:
    (a) auto_shortcut_after escalates to pointer jumping and converges on a
    chain graph whose diameter far exceeds max_iters; (b) with escalation
    disabled and max_iters too small, the op RAISES instead of returning
    wrong labels."""
    import pytest

    from upton_ray.datapipe import connected_components

    # one chain component: ids 0,25,50,...  (k=25 edges; diameter 399)
    ids = np.arange(400, dtype=np.int64) * 25
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   tmp_path / "documents.parquet")
    got = _collect(connected_components(str(tmp_path), max_iters=64,
                                        auto_shortcut_after=8))
    labs = got["label"].to_numpy(zero_copy_only=False)
    assert (labs == 0).all() and len(labs) == 400
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(str(tmp_path), max_iters=16,
                             auto_shortcut_after=10_000)


def test_bm25_score_matches_hand_formula(ray_session, tmp_path):
    """Tiny corpus with hand-checkable tf/df/dl: the distributed two-pass
    BM25 must equal the textbook formula computed directly."""
    import math

    texts = ["fox fox dog", "dog cat", "bird bird bird bird", ""]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["src0"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    terms, k1, b = ("fox", "dog"), 1.2, 0.75
    t = _collect(datapipe.bm25_score(str(tmp_path), terms=terms),
                 ("doc_id", pa.int64()), ("bm25", pa.float64()))
    got = dict(zip(t["doc_id"].to_pylist(), t["bm25"].to_pylist()))

    # by hand: dl over docs with tokens (the '' doc has none)
    dls = {0: 3, 1: 2, 2: 4}
    avgdl = (3 + 2 + 4) / 3
    n_docs = 4
    df = {"fox": 1, "dog": 2}
    tf = {0: {"fox": 2, "dog": 1}, 1: {"dog": 1}, 2: {}}

    def idf(term):
        return math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1)

    want = {}
    for d, tfs in tf.items():
        s = sum(idf(x) * c * (k1 + 1)
                / (c + k1 * (1 - b + b * dls[d] / avgdl))
                for x, c in tfs.items())
        if tfs:
            want[d] = round(s, 6)
    assert got == pytest.approx(want)
    assert set(got) == {0, 1}          # doc 2 (no query terms) and empty
                                       # doc 3 are filtered out


def test_hash_split_is_md5_replayable(ray_session, dup_dir):
    import hashlib

    t = _collect(datapipe.hash_split(dup_dir, n_splits=10),
                 ("doc_id", pa.int64()), ("split", pa.int64()))
    got = dict(zip(t["doc_id"].to_pylist(), t["split"].to_pylist()))
    want = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10
            for i in range(5)}
    assert got == want
