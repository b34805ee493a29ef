"""BPE training/encoding conformance vs a sequential reference.

bpe_train is not SQL-expressible (iterative argmax), so like
kmeans_clusters its gate is rows-only and its correctness contract lives
here: the distributed word-count + vectorized merge loop must reproduce a
plain per-word Python implementation of Sennrich et al. (2016) exactly —
same merges, same tie-breaks, same greedy left-to-right application — and
bpe_encode's piece counts must match the reference segmentation."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_spans_hitters import _collect
from upton_ray import datapipe


def _write_docs(tmp_path, texts):
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")


def ref_bpe(word_counts, n_merges):
    """Textbook sequential BPE: dict of word -> symbol list, pair counts
    by full scan, merge = (count desc, left asc, right asc), applied
    greedily left-to-right per word."""
    segs = {w: list(w) for w in word_counts if w}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for w, syms in segs.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < 2:
            break
        merges.append((rank, l, r, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


def _word_counts(texts):
    wc = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_train_matches_reference_classic(ray_session, tmp_path):
    # the Sennrich example vocabulary with known first merges
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    _write_docs(tmp_path, texts)
    got = datapipe.bpe_train(str(tmp_path), n_merges=8).to_pandas()
    want, _ = ref_bpe(_word_counts(texts), 8)
    assert list(map(tuple, got.values.tolist())) == want
    assert tuple(got.iloc[0]) == (1, "e", "s", 9)   # the classic head
    assert tuple(got.iloc[1]) == (2, "es", "t", 9)


def test_bpe_train_matches_reference_random(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    vocab = ["aa", "aaa", "abab", "banana", "bandana", "low", "lowest",
             "xyz", "zzzz", "a"]
    texts = [" ".join(rng.choice(vocab, rng.randint(1, 12)))
             for _ in range(300)] + ["", "  "]
    _write_docs(tmp_path, texts)
    got = datapipe.bpe_train(str(tmp_path), n_merges=15).to_pandas()
    want, _ = ref_bpe(_word_counts(texts), 15)
    assert list(map(tuple, got.values.tolist())) == want
    # overlapping-run regression: 'zzzz' under merge (z,z) must segment
    # as [zz, zz], never [zz, z, z] double-counted


def test_bpe_encode_matches_reference_segmentation(ray_session, tmp_path):
    rng = np.random.RandomState(9)
    vocab = ["banana", "bandana", "low", "lower", "newest", "widest",
             "aaaa", "ab"]
    texts = [" ".join(rng.choice(vocab, rng.randint(1, 10)))
             for _ in range(200)] + [""]
    _write_docs(tmp_path, texts)
    got = _collect(datapipe.bpe_encode(str(tmp_path), n_merges=10)) \
        .sort_values("doc_id").reset_index(drop=True)
    _, segs = ref_bpe(_word_counts(texts), 10)
    want = []
    for t in texts:
        toks = [w for w in " ".join(t.lower().split()).split(" ") if w]
        want.append(sum(len(segs[w]) for w in toks))
    assert got["n_pieces"].tolist() == want
    assert got["n_pieces"].iloc[-1] == 0        # the empty doc
