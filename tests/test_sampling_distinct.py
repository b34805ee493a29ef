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
