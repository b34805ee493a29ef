"""centroid_distance: planted-cluster sanity + oracle match.

Two orthogonal clusters with one planted outlier: members of a tight
cluster score ~1 against their centroid, the outlier (a vector from the
other cluster's direction but labelled into this one) scores low — and
the whole frame matches the DuckDB list_cosine_similarity oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_spans_hitters import _collect


def _write_emb(tmp_path, vecs, labels):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")


def test_centroid_distance_planted_outlier(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    rng = np.random.RandomState(3)
    dim = 16
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    vecs, labels = [], []
    for base, lab in ((a, 0), (b, 1)):
        for _ in range(20):
            vecs.append(base + rng.randn(dim) * 0.01)
            labels.append(lab)
    vecs.append(b.copy())        # outlier: b-direction vector labelled 0
    labels.append(0)
    _write_emb(tmp_path, vecs, labels)

    got = _collect(datapipe.centroid_distance(str(tmp_path))) \
        .sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = con.sql(e.oracle_sql()["centroid_distance"]).df() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["label"].tolist() == want["label"].tolist()
    # raw doubles on both sides (no pre-comparison 6dp round, ADVICE r4):
    # only float-sum reassociation separates the engines, so ~1e-9 holds
    # with orders of margin — the old rounded contract needed atol=2e-6
    # because values near a 6th-decimal boundary could flip.
    np.testing.assert_allclose(got["cos_sim"], want["cos_sim"], atol=1e-9)
    by_id = got.set_index("vec_id")["cos_sim"]
    # tight members cohere; the planted outlier does not
    assert (by_id[:40] > 0.99).all()
    assert by_id[40] < 0.3
