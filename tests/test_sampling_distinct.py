"""Edge-case tests for span_kind_hist / reservoir_sample / distinct_by_type."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_spans_hitters import _collect, _write_docs, _write_events


def test_span_kind_hist_equals_exploded_rows(ray_session, tmp_path):
    from upton_ray import datapipe

    texts = ["", "a b", " ".join(f"t{i}" for i in range(30)), "x" * 100]
    _write_docs(tmp_path, [1, 2, 3, 4], texts)
    hist = _collect(datapipe.span_kind_hist(str(tmp_path))) \
        .set_index("kind")
    spans = _collect(datapipe.span_explode(str(tmp_path)))
    for kind, grp in spans.groupby("kind"):
        assert hist.loc[kind, "n_spans"] == len(grp)
        assert hist.loc[kind, "total_chars"] == \
            sum(len(s) for s in grp.span_text)
    assert set(hist.index) == {"h1.article-title", "p", "media.img"}


def test_reservoir_sample_is_deterministic_and_uniformish(ray_session,
                                                          tmp_path):
    from upton_ray import datapipe

    _write_docs(tmp_path, list(range(1000)), ["t"] * 1000)
    a = _collect(datapipe.reservoir_sample(str(tmp_path), k=50))
    b = _collect(datapipe.reservoir_sample(str(tmp_path), k=50))
    assert list(a.doc_id) == list(b.doc_id)        # replayable
    assert len(a) == 50
    assert a.priority.is_monotonic_increasing      # sorted by priority
    # hash-priority sampling is exactly "k smallest md5" — check against
    # a local recomputation
    import hashlib
    pri = sorted((hashlib.md5(f"smp:{i}".encode()).hexdigest(), i)
                 for i in range(1000))
    assert list(a.doc_id) == [i for _, i in pri[:50]]


def test_reservoir_sample_k_exceeds_corpus(ray_session, tmp_path):
    from upton_ray import datapipe

    _write_docs(tmp_path, [3, 1, 2], ["x"] * 3)
    out = _collect(datapipe.reservoir_sample(str(tmp_path), k=10))
    assert sorted(out.doc_id) == [1, 2, 3]         # all rows, no padding


def test_distinct_by_type_cross_block_dedup(ray_session, tmp_path):
    from upton_ray import datapipe

    # user 7 does 'view' 500x (spanning blocks) but counts once; users
    # 100..149 each do one 'click'
    users = [7] * 500 + list(range(100, 150))
    _write_events(tmp_path, users)
    t = pq.read_table(tmp_path / "events.parquet")
    types = np.array(["view"] * 500 + ["click"] * 50)
    t = t.set_column(t.schema.get_field_index("event_type"), "event_type",
                     pa.array(types, pa.string()))
    pq.write_table(t, tmp_path / "events.parquet")

    out = _collect(datapipe.distinct_by_type(str(tmp_path))) \
        .set_index("event_type")
    assert out.loc["view", "n_users"] == 1
    assert out.loc["click", "n_users"] == 50


def test_bigram_logprob_tiny_corpus(ray_session, tmp_path):
    from upton_ray import datapipe

    # corpus: "a b a b a" (bigrams ab,ba,ab,ba), "a a" (aa), "x" (none), ""
    _write_docs(tmp_path, [1, 2, 3, 4], ["a b a b a", "a a", "x", ""])
    out = _collect(datapipe.bigram_logprob(str(tmp_path))) \
        .set_index("doc_id")
    # corpus counts: c(a,b)=2 c(b,a)=2 c(a,a)=1 -> c(a,*)=3 c(b,*)=2
    lp_ab = np.log(2 / 3)
    lp_ba = np.log(2 / 2)
    lp_aa = np.log(1 / 3)
    assert set(out.index) == {1, 2}                # <2-token docs emit none
    assert out.loc[1, "n_bigrams"] == 4
    assert abs(out.loc[1, "avg_logprob"]
               - round((2 * lp_ab + 2 * lp_ba) / 4, 6)) < 1e-9
    assert out.loc[2, "n_bigrams"] == 1
    assert abs(out.loc[2, "avg_logprob"] - round(lp_aa, 6)) < 1e-9


def test_sample_weighted_prefers_heavy_docs(ray_session, tmp_path):
    from upton_ray import datapipe

    # 100 tiny docs (1 char) + 20 huge docs (10k chars): with k=20 the
    # heavy docs should dominate the weighted draw (each huge doc has
    # ~10^4 x the weight), and the draw must be replayable
    texts = ["x"] * 100 + ["y" * 10_000] * 20
    _write_docs(tmp_path, list(range(120)), texts)
    a = _collect(datapipe.sample_weighted(str(tmp_path), k=20))
    b = _collect(datapipe.sample_weighted(str(tmp_path), k=20))
    assert list(a.doc_id) == list(b.doc_id)
    heavy = set(range(100, 120))
    assert len(set(a.doc_id) & heavy) >= 15   # weighting actually bites


def test_mad_outliers_flags_planted_spikes(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from upton_ray import datapipe

    n = 2000
    users = list(range(n))
    _write_events(tmp_path, users)
    t = pq.read_table(tmp_path / "events.parquet")
    rng = np.random.default_rng(5)
    vals = rng.normal(100.0, 5.0, size=n)
    vals[[10, 500, 1500]] = [10_000.0, -10_000.0, 5_000.0]  # spikes
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array(vals, pa.float64()))
    pq.write_table(t, tmp_path / "events.parquet")

    out = _collect(datapipe.mad_outliers(str(tmp_path)))
    got = set(out.event_id)
    assert {10, 500, 1500} <= got             # planted spikes flagged
    # exact expectation: |v - med| > 3 * MAD with sample median/MAD
    med = float(np.median(vals))
    mad = float(np.median(np.abs(vals - med)))
    want = {i for i in range(n) if abs(vals[i] - med) > 3 * mad}
    assert got == want


def test_span_pack_matches_local_prefix_sum(ray_session, tmp_path):
    from upton_ray import datapipe

    texts = ["", "a b c", " ".join(["t"] * 700), "x y"]
    _write_docs(tmp_path, [1, 2, 3, 4], texts)
    out = _collect(datapipe.span_pack(str(tmp_path), budget=768)) \
        .sort_values("doc_id").reset_index(drop=True)
    costs = [0 + 65, 3 + 65, 700 + 65, 2 + 65]
    assert list(out.cost) == costs
    prefix = np.concatenate([[0], np.cumsum(costs)[:-1]])
    assert list(out.seq_id) == list(prefix // 768)


def test_media_phash_dedup_groups_and_seam(ray_session, tmp_path):
    from upton_ray import datapipe
    from upton_ray.datapipe import MediaDecoder

    # fake decode keys off len('assets/<id>.img'): ids 1..9 share a ref
    # length (one group of 9), ids 10..99 share another — groups are by
    # ref-length under the documented stand-in
    _write_docs(tmp_path, list(range(1, 30)), ["t"] * 29)
    out = _collect(datapipe.media_phash_dedup(str(tmp_path))) \
        .sort_values("phash").reset_index(drop=True)
    w1, h1 = MediaDecoder._decode("assets/1.img")
    w2, h2 = MediaDecoder._decode("assets/10.img")
    assert list(out.phash) == sorted([w1 * 4096 + h1, w2 * 4096 + h2])
    assert sorted(out.n_docs) == [9, 20]
    assert set(out.rep_doc_id) == {1, 10}


def test_balanced_sample_equal_representation(ray_session, tmp_path):
    import hashlib

    from upton_ray import datapipe

    # source A has 500 docs, source B has 10: the balanced draw takes
    # k=25 from A but all 10 from B, each the k smallest md5 priorities
    n_a, n_b = 500, 10
    _write_docs(tmp_path, list(range(n_a + n_b)), ["t"] * (n_a + n_b),
                sources=["A"] * n_a + ["B"] * n_b)
    out = _collect(datapipe.balanced_sample(str(tmp_path), per_source=25))
    a = out[out.source == "A"]
    b = out[out.source == "B"]
    assert len(a) == 25 and len(b) == 10
    pri = sorted((hashlib.md5(f"bal:{i}".encode()).hexdigest(), i)
                 for i in range(n_a))
    assert sorted(a.doc_id) == sorted(i for _, i in pri[:25])
    assert list(a.sort_values("rank").doc_id) == [i for _, i in pri[:25]]
