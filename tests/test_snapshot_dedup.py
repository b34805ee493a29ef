"""snapshot_dedup: incremental (snapshot-over-snapshot) exact dedup —
bloom screen over the PRIOR snapshot + exact anti-join confirm.

Pinned here: the planted keep/drop law (re-crawled text dropped, fresh
text kept), bloom primitive membership + measured false-positive rate,
exactness under a DELIBERATELY undersized bloom (the anti-join must
absorb every false positive), and the sf-table oracle equality the
driver gate also checks at sf0.01.
"""

import hashlib

import duckdb
import numpy as np
import pandas as pd

from tests.test_round5d_ops import _write_docs
from tests.test_spans_hitters import _collect
from upton_ray import datapipe
from upton_ray.datapipe import _bloom_hashes, _bloom_set, _bloom_test

SF = "/root/testdata/sf0.001"


def _split(doc_id: int, modulus: int = 10) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % modulus


def _ids_by_side(n: int, old_splits: int = 7):
    old = [i for i in range(n) if _split(i) < old_splits]
    new = [i for i in range(n) if _split(i) >= old_splits]
    return old, new


def test_planted_keep_drop_law(ray_session, tmp_path):
    old, new = _ids_by_side(40)
    assert len(old) >= 3 and len(new) >= 3
    texts = [""] * 40
    for i in old:
        texts[i] = f"old snapshot page {i}"
    # first new doc re-crawls an old page verbatim; the rest are fresh
    texts[new[0]] = texts[old[0]]
    # second new doc matches old content modulo the normalization
    # (case + whitespace) — still a duplicate under the fp contract
    texts[new[1]] = "  OLD   snapshot PAGE " + str(old[1]) + " "
    for i in new[2:]:
        texts[i] = f"fresh crawl page {i}"
    _write_docs(tmp_path, texts)
    got = _collect(datapipe.snapshot_dedup(str(tmp_path)))
    kept = set(got["doc_id"])
    assert new[0] not in kept
    assert new[1] not in kept
    assert kept == set(new[2:])


def test_bloom_primitives_membership_and_fpr():
    def hexes(n, tag):
        # real md5 fingerprints (both 64-bit halves uniform) — a zeroed
        # top half would degenerate h1 and collapse the KM probe family
        return [hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
                for i in range(n)]

    members = hexes(5_000, "m")
    others = hexes(20_000, "o")
    bm = np.zeros((1 << 20) // 8, np.uint8)
    h1, h2 = _bloom_hashes(members)
    _bloom_set(bm, h1, h2, 4)
    assert _bloom_test(bm, h1, h2, 4).all()          # no false negatives
    o1, o2 = _bloom_hashes(others)
    fpr = _bloom_test(bm, o1, o2, 4).mean()
    # 5k keys in 1M bits at k=4: theoretical FPR ~ 1e-7; allow slack
    assert fpr < 1e-3, fpr


def test_undersized_bloom_still_exact(ray_session, tmp_path):
    """With a 256-bit bloom nearly every new doc is a false positive;
    the anti-join confirm must still produce the exact answer."""
    old, new = _ids_by_side(60)
    texts = [""] * 60
    for i in old:
        texts[i] = f"page body {i}"
    dup, fresh = new[: len(new) // 2], new[len(new) // 2:]
    for j, i in enumerate(dup):
        texts[i] = f"page body {old[j]}"
    for i in fresh:
        texts[i] = f"never seen before {i}"
    _write_docs(tmp_path, texts)
    got = _collect(datapipe.snapshot_dedup(str(tmp_path), m_bits=256))
    assert set(got["doc_id"]) == set(fresh)


def test_sf_matches_oracle(ray_session):
    import __ray_entry__ as e
    got = _collect(datapipe.snapshot_dedup(SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    exp = con.sql(e.oracle_sql()["snapshot_dedup"]).df() \
        .sort_values("doc_id").reset_index(drop=True)[got.columns]
    exp["doc_id"] = exp["doc_id"].astype(got["doc_id"].dtype)
    pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------- snapshot_minhash_dedup


def _shingles(text: str) -> set:
    w = text.split()
    if len(w) >= 3:
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    return {" ".join(w)} if w else set()


def test_snapshot_minhash_planted(ray_session, tmp_path):
    """Cross-snapshot near-dups found; within-side near-dups excluded."""
    old, new = _ids_by_side(40)
    assert len(old) >= 3 and len(new) >= 5
    texts = [" ".join(f"u{i}t{j}" for j in range(12)) for i in range(40)]
    base = " ".join(f"page tok{j} word{j}x" for j in range(14))  # 42 tokens
    texts[old[0]] = base
    drifted = base.split()
    drifted[20] = "CHANGED"
    texts[new[0]] = " ".join(drifted)            # near-dup of old[0]
    texts[new[1]] = base                         # exact re-crawl of old[0]
    texts[new[2]] = texts[new[3]] = " ".join(    # new-new pair: excluded
        f"nn tok{j} fresh{j}" for j in range(14))
    texts[old[1]] = texts[old[2]] = " ".join(    # old-old pair: excluded
        f"oo tok{j} stale{j}" for j in range(14))
    _write_docs(tmp_path, texts)
    got = _collect(datapipe.snapshot_minhash_dedup(str(tmp_path))) \
        .set_index("doc_id")
    assert set(got.index) == {new[0], new[1]}
    a, b = _shingles(texts[old[0]].lower()), _shingles(texts[new[0]].lower())
    exp = len(a & b) / len(a | b)
    assert exp >= 0.8
    assert got.loc[new[0], "n_partners"] == 1
    assert abs(got.loc[new[0], "max_jacc"] - exp) < 1e-12
    assert got.loc[new[1], "n_partners"] == 1
    assert got.loc[new[1], "max_jacc"] == 1.0


def test_snapshot_minhash_sf_matches_oracle(ray_session):
    import __ray_entry__ as e
    got = _collect(datapipe.snapshot_minhash_dedup(SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    exp = con.sql(e.oracle_sql()["snapshot_minhash_dedup"]).df() \
        .sort_values("doc_id").reset_index(drop=True)[got.columns]
    for c in got.columns:
        exp[c] = exp[c].astype(got[c].dtype)
    pd.testing.assert_frame_equal(got, exp)


# -------------------------------------------------- snapshot_embedding_dedup


def _write_embeddings(tmp_path, vecs: np.ndarray):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = len(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, np.int32), pa.int32()),
    }), tmp_path / "embeddings.parquet")


def test_snapshot_embedding_planted(ray_session, tmp_path):
    """Cross-snapshot embedding near-dups found (jittered copies of old
    vectors); within-side near-dups excluded; random vectors never match."""
    old, new = _ids_by_side(64)
    assert len(old) >= 3 and len(new) >= 5
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(64, 32))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def near(v):                       # cos > 0.999 jittered copy
        w = v + 0.01 * rng.normal(size=v.shape)
        return w / np.linalg.norm(w)

    vecs[new[0]] = near(vecs[old[0]])            # cross: must match
    vecs[new[1]] = vecs[old[1]]                  # cross, exact copy
    vecs[new[2]] = near(vecs[new[3]])            # new-new: excluded
    vecs[old[2]] = near(vecs[old[0]])            # old-old: excluded — but
    # it ALSO sits near new[0] (both jitters of old[0]) if cos >= 0.95
    _write_embeddings(tmp_path, vecs)
    got = _collect(datapipe.snapshot_embedding_dedup(str(tmp_path))) \
        .set_index("vec_id")
    cos = float(vecs[new[0]] @ vecs[old[2]])
    exp_partners_new0 = 1 + (cos >= 0.95)
    assert set(got.index) == {new[0], new[1]}
    assert got.loc[new[0], "n_partners"] == exp_partners_new0
    assert got.loc[new[1], "n_partners"] == 1


def test_snapshot_embedding_sf_matches_oracle(ray_session):
    import __ray_entry__ as e
    got = _collect(datapipe.snapshot_embedding_dedup(SF))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{SF}/embeddings.parquet'")
    exp = con.sql(e.oracle_sql()["snapshot_embedding_dedup"]).df()
    # the sf corpus plants no 0.95-pairs — both sides must agree on empty
    assert len(got) == len(exp) == 0
