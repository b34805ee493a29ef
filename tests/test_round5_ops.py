"""Round-5 operators: planted-structure behavioral tests.

Each new op also has an oracle_sql() entry (the sf-gate covers engine-vs-
DuckDB equality); these tests pin the SEMANTICS on hand-built inputs where
the right answer is known by construction — gap stats across block edges,
triangles counted by brute force, k-NN against a numpy argsort, containment
of a planted benchmark quote, RRF arithmetic."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_spans_hitters import _collect
from upton_ray import datapipe


def _write_events(tmp_path, user_ids, ts_us, event_ids=None):
    n = len(user_ids)
    t = pa.table({
        "event_id": pa.array(event_ids if event_ids is not None
                             else np.arange(n), pa.int64()),
        "user_id": pa.array(user_ids, pa.int64()),
        "ts": pa.array(np.array(ts_us, dtype="datetime64[us]"),
                       pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")


def test_inter_event_stats_planted_gaps(ray_session, tmp_path):
    # user 1: events at 0, 10, 40 us -> gaps 10, 30; user 2: single event
    # (dropped); user 3: events at 5, 6 -> gap 1
    _write_events(tmp_path,
                  user_ids=[1, 1, 1, 2, 3, 3],
                  ts_us=[0, 10, 40, 7, 5, 6])
    got = _collect(datapipe.inter_event_stats(str(tmp_path), num_blocks=2)) \
        .sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [1, 3]
    assert got["n_gaps"].tolist() == [2, 1]
    assert got["min_gap_us"].tolist() == [10, 1]
    assert got["max_gap_us"].tolist() == [30, 1]
    assert got["mean_gap_us"].tolist() == [20.0, 1.0]


def test_inter_event_stats_block_straddle(ray_session, tmp_path):
    """A user whose events span the num_blocks sort boundary must aggregate
    ALL its gaps exactly once (the scaffold's residual path)."""
    rng = np.random.RandomState(0)
    n = 4000
    users = rng.randint(0, 37, n)
    ts = rng.randint(0, 10**9, n)
    _write_events(tmp_path, users, ts)
    got = _collect(datapipe.inter_event_stats(str(tmp_path), num_blocks=7)) \
        .set_index("user_id").sort_index()
    import pandas as pd

    df = pd.DataFrame({"u": users, "ts": ts,
                       "eid": np.arange(n)}).sort_values(["u", "ts", "eid"])
    gaps = df.groupby("u")["ts"].diff().dropna()
    want = gaps.groupby(df["u"]).agg(["count", "min", "max", "sum"])
    want = want[want["count"] > 0]
    assert got["n_gaps"].tolist() == want["count"].astype(int).tolist()
    assert got["min_gap_us"].tolist() == want["min"].astype(int).tolist()
    assert got["max_gap_us"].tolist() == want["max"].astype(int).tolist()
    np.testing.assert_array_equal(
        got["mean_gap_us"].to_numpy(),
        want["sum"].to_numpy(dtype=np.int64)
        / want["count"].to_numpy(dtype=np.int64))


def test_readability_score_known_text(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "The cat sat. The dog ran!",   # 20 alnum, 6 words, 2 sentences
            "word",                        # 4 alnum, 1 word, 0 -> 1 sentence
            "",                            # empty: ari NULL
        ], pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _collect(datapipe.readability_score(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_alnum"].tolist() == [18, 4, 0]
    assert got["n_words"].tolist() == [6, 1, 0]
    assert got["n_sentences"].tolist() == [2, 1, 1]
    ari0 = 4.71 * (18 / 6) + 0.5 * (6 / 2) - 21.43
    ari1 = 4.71 * (4 / 1) + 0.5 * (1 / 1) - 21.43
    assert got["ari"][0] == ari0 and got["ari"][1] == ari1
    assert np.isnan(got["ari"][2])


def test_url_dedup_collapses_canonical_variants(ray_session, tmp_path):
    # doc_ids congruent mod 211 within one source share a canonical URL
    docs = pa.table({
        "doc_id": pa.array([0, 211, 422, 5, 216], pa.int64()),
        "source": pa.array(["src01"] * 5, pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _collect(datapipe.url_dedup(str(tmp_path))) \
        .sort_values("canon").reset_index(drop=True)
    assert len(got) == 2
    assert got["doc_id"].tolist() == [0, 5]   # min doc_id survives
    assert got["canon"][0] == \
        "http://www.src01.test/Article/0?a=1&b=2"


def test_triangle_count_matches_brute_force(ray_session, tmp_path):
    n = 400
    present = np.array(sorted(set(range(n)) - {7, 8, 100, 101, 102, 350}),
                       dtype=np.int64)
    pq.write_table(pa.table({"doc_id": pa.array(present, pa.int64())}),
                   tmp_path / "documents.parquet")
    got = _collect(datapipe.triangle_count(str(tmp_path), num_partitions=4))
    ids = set(present.tolist())
    edges = {(a, a + d) for a in ids for d in (1, 2, 3) if a + d in ids}
    brute = sum(1 for (a, b) in edges for c in (b + 1, b + 2, b + 3)
                if (b, c) in edges and (a, c) in edges)
    assert int(got["n_triangles"][0]) == brute > 0


def test_knn_graph_matches_numpy(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    n, dim, k = 300, 24, 4
    M = rng.randn(n, dim).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in M],
                              pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    got = _collect(datapipe.knn_graph(str(tmp_path), k=k, num_blocks=5)) \
        .sort_values(["src_id", "rank"]).reset_index(drop=True)
    X = M.astype(np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    sims = X @ X.T
    np.fill_diagonal(sims, -np.inf)
    for src in range(n):
        order = np.lexsort((np.arange(n), -sims[src]))[:k]
        mine = got[got["src_id"] == src].sort_values("rank")
        assert mine["dst_id"].tolist() == order.tolist(), src
    assert len(got) == n * k


def test_ngram_containment_planted_quote(ray_session, tmp_path):
    bench = "alpha beta gamma delta epsilon zeta"      # doc 0 = benchmark
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            bench,
            "alpha beta gamma delta unrelated words here",  # 2 of 5 grams
            "totally different text with no overlap at all",
        ], pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _collect(datapipe.ngram_containment(str(tmp_path))) \
        .set_index("doc_id")
    # doc 1: grams {alpha beta gamma, beta gamma delta, gamma delta
    # unrelated, delta unrelated words, unrelated words here} -> 2 hits / 5
    assert got.loc[1, "n_grams"] == 5 and got.loc[1, "n_overlap"] == 2
    assert got.loc[1, "containment"] == 2 / 5
    assert got.loc[2, "n_overlap"] == 0 and got.loc[2, "containment"] == 0.0
    assert 0 not in got.index


def test_top_terms_per_lang_counts_and_ties(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lang": pa.array(["en", "en", "de"], pa.string()),
        "text": pa.array([
            "aa aa bb cc",          # en: aa x2
            "bb cc dd",             # en totals: aa2 bb2 cc2 dd1
            "xx yy yy",             # de: yy2 xx1
        ], pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _collect(datapipe.top_terms_per_lang(str(tmp_path), top_n=2)) \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    # ties (aa/bb/cc all x2) break lexicographically
    assert got[got["lang"] == "en"]["term"].tolist() == ["aa", "bb"]
    assert got[got["lang"] == "en"]["n"].tolist() == [2, 2]
    assert got[got["lang"] == "de"]["term"].tolist() == ["yy", "xx"]
    assert got[got["lang"] == "de"]["rank"].tolist() == [1, 2]


def test_rrf_fuse_arithmetic(ray_session):
    """Every query's self-vector tops both lists, so its fused score must
    be exactly 2/(60+1); ranks are 1..k_out per query."""
    t = datapipe.rrf_fuse("/root/testdata/sf0.001").to_pandas()
    assert set(t["query_id"]) == {0, 1, 2, 3}
    for q, g in t.groupby("query_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, 11))
        assert g.iloc[0]["vec_id"] == q            # self wins both channels
        assert g.iloc[0]["score"] == 1.0 / 61 + 1.0 / 61
        assert (np.diff(g["score"].to_numpy()) <= 0).all()


def test_trailing_window_sum_boundaries_and_peers(ray_session, tmp_path):
    """RANGE window semantics: an event exactly window_s earlier IS
    included; equal-timestamp peers include EACH OTHER (unlike a ROWS
    frame); other users never leak in."""
    H = 3_600_000_000                              # 1h in us
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 1], pa.int64()),
        "ts": pa.array(np.array([0, H, H, 2 * H + 1, H, 3 * H],
                                dtype="datetime64[us]"), pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 100.0, 5.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = _collect(datapipe.trailing_window_sum(str(tmp_path),
                                                num_blocks=2)) \
        .set_index("event_id").sort_index()
    # e0: [0] -> 100; e1/e2: peers at H with e0 at exactly H-3600s -> all
    # three -> 600 each; e3 at 2H+1: only itself (peers at H are > 1h ago)
    # -> 400; e5 at 3H: e3 within (3H-1h = 2H <= 2H+1) -> 900; user 2: 10000
    assert got.loc[0, "win_cents"] == 100
    assert got.loc[1, "win_cents"] == 600 and got.loc[2, "win_cents"] == 600
    assert got.loc[3, "win_cents"] == 400
    assert got.loc[5, "win_cents"] == 900
    assert got.loc[4, "win_cents"] == 10000


def test_trailing_window_sum_matches_pandas_rolling(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    n = 3000
    users = rng.randint(0, 23, n)
    ts = np.sort(rng.randint(0, 10**10, n))        # dense: real windows
    vals = rng.random(n) * 100
    t = pa.table({"event_id": pa.array(np.arange(n), pa.int64()),
                  "user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(ts.astype("datetime64[us]"),
                                 pa.timestamp("us")),
                  "value": pa.array(vals, pa.float64())})
    pq.write_table(t, tmp_path / "events.parquet")
    got = _collect(datapipe.trailing_window_sum(str(tmp_path), window_s=3600,
                                                num_blocks=5)) \
        .set_index("event_id").sort_index()
    cents = np.round(vals * 100).astype(np.int64)
    W = 3_600_000_000
    want = np.empty(n, dtype=np.int64)
    for i in range(n):                             # brute-force oracle
        m = (users == users[i]) & (ts >= ts[i] - W) & (ts <= ts[i])
        want[i] = cents[m].sum()
    assert got["win_cents"].to_numpy().tolist() == want.tolist()


def test_host_share_and_mix_weights(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array(np.arange(10), pa.int64()),
        "source": pa.array(["s1"] * 6 + ["s2"] * 3 + ["s3"], pa.string()),
        "text": pa.array(["x"] * 10, pa.string()),
        "lang": pa.array(["en"] * 10, pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    hs = _collect(datapipe.host_share(str(tmp_path)))
    assert hs["source"].tolist() == ["s1", "s2", "s3"]
    assert hs["n_docs"].tolist() == [6, 3, 1]
    assert hs["share"].tolist() == [0.6, 0.3, 0.1]
    assert hs["rank"].tolist() == [1, 2, 3]
    mw = _collect(datapipe.mix_weights(str(tmp_path))) \
        .set_index("source")["weight"]
    pw = np.array([6.0, 3.0, 1.0]) ** 0.7
    np.testing.assert_allclose(
        mw[["s1", "s2", "s3"]].to_numpy(), pw / pw.sum(), rtol=1e-12)
    assert abs(mw.sum() - 1.0) < 1e-12
    # temperature flattens: s3's weight share > its raw share
    assert mw["s3"] > 0.1


def test_vocab_coverage_planted(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa aa aa bb bb cc", "aa dd"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["s", "s"], pa.string())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = _collect(datapipe.vocab_coverage(str(tmp_path), tops=(1, 2, 100))) \
        .set_index("top_n")
    # counts: aa=4 bb=2 cc=1 dd=1, total 8
    assert got.loc[1, "covered"] == 4 and got.loc[1, "coverage"] == 4 / 8
    assert got.loc[2, "covered"] == 6
    assert got.loc[100, "covered"] == 8 and got.loc[100, "coverage"] == 1.0
    assert (got["total"] == 8).all()


def test_degree_distribution_brute_force(ray_session, tmp_path):
    present = np.array(sorted(set(range(300)) - {50, 51, 52, 53, 200}),
                       dtype=np.int64)
    pq.write_table(pa.table({"doc_id": pa.array(present, pa.int64())}),
                   tmp_path / "documents.parquet")
    got = _collect(datapipe.degree_distribution(str(tmp_path),
                                                num_partitions=4)) \
        .set_index("degree")["n_nodes"]
    ids = set(present.tolist())
    deg = {i: 0 for i in ids}
    for a in ids:
        for d in (1, 2, 3):
            if a + d in ids:
                deg[a] += 1
                deg[a + d] += 1
    import collections

    want = collections.Counter(deg.values())
    assert dict(got) == dict(want)
    assert got.sum() == len(present)               # every node counted once


def test_perplexity_buckets_planted_tiers(ray_session, tmp_path):
    """9 docs: 3 of a very common token (highest logprob -> bucket 1),
    3 mixed, 3 of unique rare tokens (lowest -> bucket 3); NTILE fill is
    exact thirds."""
    from tests.test_spans_hitters import _write_docs

    texts = (["common common common"] * 3
             + ["common mid%d common" % i for i in range(3)]
             + ["rare%da rare%db rare%dc" % (i, i, i) for i in range(3)])
    _write_docs(tmp_path, list(range(9)), texts)
    got = _collect(datapipe.perplexity_buckets(str(tmp_path), k=3)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["bucket"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    # head docs' logprob: every token is 'common' (cf=15 of T=27)
    lp_head = round(float(np.log(15 / 27.0)), 6)
    assert np.allclose(got.loc[:2, "logprob"], lp_head, atol=1e-9)


def test_perplexity_buckets_remainder_fill(ray_session, tmp_path):
    """NTILE(3) over 7 docs -> buckets sized 3,2,2 (SQL contract)."""
    from tests.test_spans_hitters import _write_docs

    # strictly decreasing predictability: doc i repeats token 'w' i times
    # then pads with unique tokens, so logprob strictly orders by doc
    texts = [" ".join(["w"] * (7 - i) + [f"u{i}x{j}" for j in range(i)])
             for i in range(7)]
    _write_docs(tmp_path, list(range(7)), texts)
    got = _collect(datapipe.perplexity_buckets(str(tmp_path), k=3)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["bucket"].tolist() == [1, 1, 1, 2, 2, 3, 3]


def test_hits_scores_matches_numpy_power_iteration(ray_session, tmp_path):
    """80-node graph: brute-force HITS with the same edge rule,
    normalization, and per-half-iteration round-12 in numpy must match the
    distributed result exactly at the round-6 output grid."""
    from tests.test_spans_hitters import _write_docs

    n = 80
    _write_docs(tmp_path, list(range(n)), ["t"] * n)
    A = np.zeros((n, n))
    for u in range(n):
        for b in (1, 2, 3):
            if 3 * u + b < n:
                A[u, 3 * u + b] = 1.0
        if u >= 1:
            A[u, u // 2] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(2):
        a = np.round((A.T @ h) / (A.T @ h).sum(), 12)
        h = np.round((A @ a) / (A @ a).sum(), 12)
    got = _collect(datapipe.hits_scores(str(tmp_path), iters=2)) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == n
    assert np.allclose(got["auth"], np.round(a, 6), atol=1e-9)
    assert np.allclose(got["hub"], np.round(h, 6), atol=1e-9)
    # authorities concentrate on low ids (every node backlinks toward the
    # root region), hubs too — sanity: node 1 beats the childless tail
    assert got.loc[1, "auth"] > got.loc[n - 1, "auth"]
