"""Unit tests for upton_ray.shuffle — the manual hash-partitioned reduce
and the generic equi-join built on it."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from upton_ray.shuffle import hash_join, hash_reduce, key_hash


def _sum_by(t: pa.Table, key="k", val="v") -> dict:
    g = t.group_by(key).aggregate([(val, "sum")])
    return dict(zip(g[key].to_pylist(), g[f"{val}_sum"].to_pylist()))


def _make_reduce_fn():
    def fn(t: pa.Table) -> pa.Table:
        import pyarrow as pa
        if "k" not in t.column_names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        g = t.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": g["k"], "v": g["v_sum"]})
    return fn


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_hash_reduce_matches_groupby(ray_session, num_partitions):
    rng = np.random.RandomState(7)
    k = rng.randint(0, 50, size=5000)
    v = rng.randint(0, 1000, size=5000)
    src = pa.table({"k": pa.array(k, pa.int64()),
                    "v": pa.array(v, pa.int64())})
    ds = ray.data.from_arrow(src).repartition(6)
    out = pa.concat_tables(
        ray.get(hash_reduce(ds, ["k"], _make_reduce_fn(),
                            num_partitions=num_partitions).to_arrow_refs()))
    assert _sum_by(out) == _sum_by(src)
    # every key appears exactly once — partitions are disjoint
    assert len(set(out["k"].to_pylist())) == out.num_rows


def test_hash_reduce_multi_key_and_strings(ray_session):
    src = pa.table({
        "a": pa.array(["x", "y", "x", "y", "x"] * 40),
        "b": pa.array([1, 1, 2, 2, 1] * 40, pa.int64()),
        "v": pa.array(list(range(200)), pa.int64())})
    ds = ray.data.from_arrow(src).repartition(5)

    def fn(t):
        if "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        g = t.group_by(["a", "b"]).aggregate([("v", "sum")])
        return pa.table({"a": g["a"], "b": g["b"], "v": g["v_sum"]})

    out = pa.concat_tables(
        ray.get(hash_reduce(ds, ["a", "b"], fn).to_arrow_refs()))
    exp = src.group_by(["a", "b"]).aggregate([("v", "sum")])
    got = {(a, b): v for a, b, v in zip(out["a"].to_pylist(),
                                        out["b"].to_pylist(),
                                        out["v"].to_pylist())}
    want = {(a, b): v for a, b, v in zip(exp["a"].to_pylist(),
                                         exp["b"].to_pylist(),
                                         exp["v_sum"].to_pylist())}
    assert got == want


def test_hash_reduce_empty_input(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                       "v": pa.array([], pa.int64())}))
    out = pa.concat_tables(
        ray.get(hash_reduce(ds, ["k"], _make_reduce_fn()).to_arrow_refs()))
    assert out.num_rows == 0


def test_key_hash_deterministic_and_order_free(ray_session):
    t = pa.table({"k": pa.array([5, 1, 5, 9], pa.int64())})
    h = key_hash(t, ["k"])
    assert h[0] == h[2]                    # same key -> same hash
    t2 = pa.table({"k": pa.array([9, 5], pa.int64())})
    h2 = key_hash(t2, ["k"])
    assert h2[1] == h[0] and h2[0] == h[3]  # row position irrelevant


def _join_case(ray_session, how, exp_rows):
    left = pa.table({"k": pa.array([1, 2, 3, 3], pa.int64()),
                     "x": pa.array(["a", "b", "c", "d"])})
    right = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                      "y": pa.array([20, 30, 40], pa.int64())})
    out = pa.concat_tables(ray.get(hash_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(2),
        "k", how=how, num_partitions=3).to_arrow_refs()))
    assert out.column_names == ["k", "x", "y"]
    assert out.num_rows == exp_rows
    return out.sort_by([("k", "ascending"), ("x", "ascending")])


def test_hash_join_inner(ray_session):
    out = _join_case(ray_session, "inner", 3)
    assert out["k"].to_pylist() == [2, 3, 3]
    assert out["x"].to_pylist() == ["b", "c", "d"]
    assert out["y"].to_pylist() == [20, 30, 30]


def test_hash_join_left_outer(ray_session):
    out = _join_case(ray_session, "left outer", 4)
    assert out["k"].to_pylist() == [1, 2, 3, 3]
    assert out["y"].to_pylist() == [None, 20, 30, 30]


def test_hash_join_full_outer(ray_session):
    out = _join_case(ray_session, "full outer", 5)
    assert set(out["k"].to_pylist()) == {1, 2, 3, 4}


def test_hash_join_name_collision_suffix(ray_session):
    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array([10, 20], pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "v": pa.array([100, 200], pa.int64())})
    out = pa.concat_tables(ray.get(hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        "k").to_arrow_refs())).sort_by("k")
    assert out.column_names == ["k", "v", "v_r"]
    assert out["v"].to_pylist() == [10, 20]
    assert out["v_r"].to_pylist() == [100, 200]


def test_hash_join_matches_duckdb_on_random(ray_session):
    import duckdb

    rng = np.random.RandomState(11)
    left = pa.table({"k": pa.array(rng.randint(0, 40, 300), pa.int64()),
                     "x": pa.array(rng.randint(0, 10**6, 300), pa.int64())})
    right = pa.table({"k": pa.array(rng.randint(0, 40, 200), pa.int64()),
                      "y": pa.array(rng.randint(0, 10**6, 200), pa.int64())})
    out = pa.concat_tables(ray.get(hash_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        "k", num_partitions=5).to_arrow_refs()))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("SELECT l.k, l.x, r.y FROM l JOIN r USING (k) "
                      "ORDER BY k, x, y").arrow()
    got = out.sort_by([("k", "ascending"), ("x", "ascending"),
                       ("y", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    assert got["x"].to_pylist() == exp["x"].to_pylist()
    assert got["y"].to_pylist() == exp["y"].to_pylist()


# ---------------------------------------------------------------- skew join

def _skewed_pair(rng, n_left=2000, hot_frac=0.4):
    """Left table where key 7 owns hot_frac of the rows; right is a dim."""
    k = rng.randint(0, 60, n_left)
    k[rng.random(n_left) < hot_frac] = 7
    left = pa.table({"k": pa.array(k, pa.int64()),
                     "x": pa.array(rng.randint(0, 10**6, n_left), pa.int64())})
    right = pa.table({"k": pa.array(np.arange(0, 50), pa.int64()),
                      "name": pa.array([f"dim-{i}" for i in range(50)])})
    return left, right


def test_detect_hot_keys(ray_session):
    from upton_ray.shuffle import detect_hot_keys

    rng = np.random.RandomState(3)
    left, _ = _skewed_pair(rng)
    ds = ray.data.from_arrow(left).repartition(6)
    hot = detect_hot_keys(ds, "k", threshold=0.2)
    assert hot.to_pylist() == [7]
    # uniform input: nothing clears a 20% bar
    uni = pa.table({"k": pa.array(rng.randint(0, 60, 2000), pa.int64())})
    assert len(detect_hot_keys(ray.data.from_arrow(uni).repartition(6),
                               "k", threshold=0.2)) == 0


@pytest.mark.parametrize("how", ["inner", "left outer"])
def test_skew_join_matches_duckdb(ray_session, how):
    import duckdb

    from upton_ray.shuffle import skew_join

    rng = np.random.RandomState(5)
    left, right = _skewed_pair(rng)
    out = pa.concat_tables(ray.get(skew_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(right).repartition(2),
        "k", how=how, hot_threshold=0.2, num_partitions=4).to_arrow_refs()))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    exp = con.execute(
        f"SELECT l.k, l.x, r.name FROM l {jt} r USING (k) "
        "ORDER BY k, x, name NULLS FIRST").arrow()
    got = out.sort_by([("k", "ascending"), ("x", "ascending"),
                       ("name", "ascending")])
    assert got.column_names == ["k", "x", "name"]
    for c in ("k", "x", "name"):
        assert got[c].to_pylist() == exp[c].to_pylist(), (how, c)


def test_skew_join_uniform_falls_back(ray_session):
    import duckdb

    from upton_ray.shuffle import skew_join

    rng = np.random.RandomState(9)
    left = pa.table({"k": pa.array(rng.randint(0, 60, 1000), pa.int64()),
                     "x": pa.array(np.arange(1000), pa.int64())})
    right = pa.table({"k": pa.array(np.arange(0, 60), pa.int64()),
                      "name": pa.array([f"d{i}" for i in range(60)])})
    out = pa.concat_tables(ray.get(skew_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right), "k",
        hot_threshold=0.2).to_arrow_refs()))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("SELECT count(*) c, sum(l.x) s FROM l JOIN r USING (k)"
                      ).fetchone()
    assert (out.num_rows, pc.sum(out["x"]).as_py()) == exp


def test_skew_join_rejects_right_outer(ray_session):
    from upton_ray.shuffle import skew_join

    t = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        skew_join(t, t, "k", how="full outer")


def test_hash_join_semi_anti(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3, 3, 4], pa.int64()),
                     "x": pa.array(["a", "b", "c", "d", "e"])})
    right = pa.table({"k": pa.array([2, 3, 3], pa.int64()),
                      "y": pa.array([20, 30, 31], pa.int64())})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right).repartition(2)
    semi = pa.concat_tables(ray.get(hash_join(
        lds, rds, "k", how="left semi",
        num_partitions=3).to_arrow_refs())).sort_by([
            ("k", "ascending"), ("x", "ascending")])
    assert semi.column_names == ["k", "x"]
    assert semi["x"].to_pylist() == ["b", "c", "d"]   # no dup from 2 matches
    anti = pa.concat_tables(ray.get(hash_join(
        lds, rds, "k", how="left anti",
        num_partitions=3).to_arrow_refs())).sort_by("k")
    assert anti.column_names == ["k", "x"]
    assert anti["x"].to_pylist() == ["a", "e"]


def test_grouped_top_n_matches_duckdb(ray_session):
    import duckdb

    from upton_ray.shuffle import grouped_top_n

    rng = np.random.RandomState(13)
    t = pa.table({"g": pa.array(rng.randint(0, 30, 800), pa.int64()),
                  "v": pa.array(rng.randint(0, 50, 800), pa.int64()),
                  "id": pa.array(np.arange(800), pa.int64())})
    out = pa.concat_tables(ray.get(grouped_top_n(
        ray.data.from_arrow(t).repartition(5), ["g"],
        [("v", "descending"), ("id", "ascending")], 3,
        rn_col="rn", num_partitions=4).to_arrow_refs()))
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT g, v, id, rn FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY g ORDER BY v DESC, id) AS rn FROM t)
        WHERE rn <= 3 ORDER BY g, rn""").arrow()
    got = out.sort_by([("g", "ascending"), ("rn", "ascending")])
    for c in ("g", "v", "id", "rn"):
        assert got[c].to_pylist() == exp[c].to_pylist(), c


def test_grouped_top_n_string_groups_and_small_groups(ray_session):
    from upton_ray.shuffle import grouped_top_n

    t = pa.table({"g": pa.array(["a", "a", "b", "c", "c", "c"]),
                  "v": pa.array([5, 9, 1, 3, 2, 8], pa.int64())})
    out = pa.concat_tables(ray.get(grouped_top_n(
        ray.data.from_arrow(t).repartition(3), ["g"],
        [("v", "descending")], 2, rn_col="rn").to_arrow_refs()))
    got = {(g, rn): v for g, v, rn in zip(out["g"].to_pylist(),
                                          out["v"].to_pylist(),
                                          out["rn"].to_pylist())}
    assert got == {("a", 1): 9, ("a", 2): 5, ("b", 1): 1,
                   ("c", 1): 8, ("c", 2): 3}


# ------------------------------------------------------- co-bucketed layout

def test_write_bucketed_layout_and_join(ray_session, tmp_path):
    import os

    import duckdb

    from upton_ray.shuffle import bucketed_join, key_hash, write_bucketed

    rng = np.random.RandomState(21)
    left = pa.table({"k": pa.array(rng.randint(0, 100, 1200), pa.int64()),
                     "x": pa.array(rng.randint(0, 10**6, 1200), pa.int64())})
    right = pa.table({"k": pa.array(rng.randint(0, 100, 400), pa.int64()),
                      "y": pa.array(rng.randint(0, 10**6, 400), pa.int64())})
    B = 8
    pl, pr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_arrow(left).repartition(4), ["k"], pl, B)
    write_bucketed(ray.data.from_arrow(right).repartition(3), ["k"], pr, B)

    # layout: every bucket dir holds only rows whose key hashes to it
    import pyarrow.parquet as pq
    seen_rows = 0
    for i in range(B):
        d = os.path.join(pl, f"__bucket={i}")
        if not os.path.isdir(d):
            continue
        t = pq.read_table(d, columns=["k"])
        seen_rows += t.num_rows
        h = key_hash(t, ["k"]) % np.uint64(B)
        assert (h == i).all(), i
    assert seen_rows == left.num_rows

    out = pa.concat_tables(ray.get(bucketed_join(
        pl, pr, "k", num_buckets=B).to_arrow_refs()))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute("SELECT l.k, l.x, r.y FROM l JOIN r USING (k) "
                      "ORDER BY k, x, y").arrow()
    got = out.sort_by([("k", "ascending"), ("x", "ascending"),
                       ("y", "ascending")])
    for c in ("k", "x", "y"):
        assert got[c].to_pylist() == exp[c].to_pylist(), c


def test_bucketed_join_left_outer_with_empty_bucket(ray_session, tmp_path):
    from upton_ray.shuffle import bucketed_join, write_bucketed

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "x": pa.array(["a", "b", "c"])})
    right = pa.table({"k": pa.array([2], pa.int64()),
                      "y": pa.array([20], pa.int64())})
    B = 16   # most buckets empty on both sides
    pl, pr = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(ray.data.from_arrow(left), ["k"], pl, B)
    write_bucketed(ray.data.from_arrow(right), ["k"], pr, B)
    out = pa.concat_tables(ray.get(bucketed_join(
        pl, pr, "k", how="left outer",
        num_buckets=B).to_arrow_refs())).sort_by("k")
    assert out["k"].to_pylist() == [1, 2, 3]
    assert out["y"].to_pylist() == [None, 20, None]


def test_hash_join_null_keys_sql_semantics(ray_session):
    """SQL semantics: NULL keys never match (inner drops them; left outer
    keeps the left rows unmatched) — and the hash ROUTING of null keys
    must not lose rows."""
    left = pa.table({"k": pa.array([1, None, 2, None], pa.int64()),
                     "x": pa.array(["a", "b", "c", "d"])})
    right = pa.table({"k": pa.array([None, 2], pa.int64()),
                      "y": pa.array([99, 20], pa.int64())})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right).repartition(2)
    inner = pa.concat_tables(ray.get(hash_join(
        lds, rds, "k", num_partitions=3).to_arrow_refs()))
    assert inner.num_rows == 1
    assert inner["x"].to_pylist() == ["c"]
    lo = pa.concat_tables(ray.get(hash_join(
        lds, rds, "k", how="left outer",
        num_partitions=3).to_arrow_refs()))
    assert lo.num_rows == 4
    got = {x: (k, y) for k, x, y in zip(lo["k"].to_pylist(),
                                        lo["x"].to_pylist(),
                                        lo["y"].to_pylist())}
    assert got == {"a": (1, None), "b": (None, None),
                   "c": (2, 20), "d": (None, None)}


def test_grouped_top_n_null_groups(ray_session):
    """SQL PARTITION BY semantics: all NULL group keys form ONE group."""
    import duckdb

    from upton_ray.shuffle import grouped_top_n

    t = pa.table({"g": pa.array([1, None, 1, None, None, 2], pa.int64()),
                  "v": pa.array([5, 9, 7, 3, 8, 1], pa.int64())})
    out = pa.concat_tables(ray.get(grouped_top_n(
        ray.data.from_arrow(t).repartition(3), ["g"],
        [("v", "descending")], 2, rn_col="rn",
        num_partitions=3).to_arrow_refs()))
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT g, v, rn FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY g ORDER BY v DESC) AS rn FROM t)
        WHERE rn <= 2 ORDER BY g NULLS FIRST, rn""").arrow()
    got = out.sort_by([("g", "ascending"), ("rn", "ascending")])
    # align null-first ordering
    gotl = sorted(zip(got["g"].to_pylist(), got["v"].to_pylist(),
                      got["rn"].to_pylist()),
                  key=lambda r: (r[0] is not None, r[0], r[2]))
    expl = list(zip(exp["g"].to_pylist(), exp["v"].to_pylist(),
                    exp["rn"].to_pylist()))
    assert gotl == expl


@pytest.mark.parametrize("how,nrows", [("inner", 3), ("left outer", 5),
                                       ("left semi", 3), ("left anti", 2)])
def test_broadcast_join(ray_session, how, nrows):
    from upton_ray.shuffle import broadcast_join

    left = pa.table({"k": pa.array([1, 2, 3, 3, 4], pa.int64()),
                     "v": pa.array([10, 20, 30, 31, 40], pa.int64())})
    right = pa.table({"k": pa.array([2, 3], pa.int64()),
                      "v": pa.array([200, 300], pa.int64())})
    out = pa.concat_tables(ray.get(broadcast_join(
        ray.data.from_arrow(left).repartition(3), right, "k",
        how=how).to_arrow_refs()))
    assert out.num_rows == nrows
    if how == "inner":
        s = out.sort_by([("k", "ascending"), ("v", "ascending")])
        assert s.column_names == ["k", "v", "v_r"]
        assert s["v_r"].to_pylist() == [200, 300, 300]
    if how == "left anti":
        assert sorted(out["k"].to_pylist()) == [1, 4]
        assert out.column_names == ["k", "v"]
    with pytest.raises(ValueError):
        broadcast_join(ray.data.from_arrow(left), right, "k",
                       how="full outer")


def test_bucketed_lookup_prunes_reads(ray_session, tmp_path):
    """Point lookup touches ONLY the requested keys' bucket dirs — proven
    behaviorally: deleting every other bucket directory changes nothing."""
    import os
    import shutil

    from upton_ray.shuffle import bucketed_lookup, key_hash, write_bucketed

    rng = np.random.RandomState(31)
    t = pa.table({"k": pa.array(np.arange(500), pa.int64()),
                  "x": pa.array(rng.randint(0, 10**6, 500), pa.int64())})
    B = 16
    p = str(tmp_path / "t")
    write_bucketed(ray.data.from_arrow(t).repartition(4), ["k"], p, B)

    want = pa.table({"k": pa.array([3, 77, 431], pa.int64())})
    out1 = pa.concat_tables(ray.get(bucketed_lookup(
        p, ["k"], want, B).to_arrow_refs())).sort_by("k")
    assert out1["k"].to_pylist() == [3, 77, 431]
    exp = {k: x for k, x in zip(t["k"].to_pylist(), t["x"].to_pylist())}
    assert out1["x"].to_pylist() == [exp[3], exp[77], exp[431]]

    needed = set((key_hash(want, ["k"]) % np.uint64(B)).astype(int))
    for i in range(B):
        if i not in needed:
            shutil.rmtree(os.path.join(p, f"__bucket={i}"),
                          ignore_errors=True)
    out2 = pa.concat_tables(ray.get(bucketed_lookup(
        p, ["k"], want, B).to_arrow_refs())).sort_by("k")
    assert out2.equals(out1)


def test_hash_reduce_coalesces_many_blocks(ray_session):
    """With more blocks than max_split_tasks, blocks are pre-coalesced in
    concat tasks — result identical, far fewer split tasks."""
    rng = np.random.RandomState(17)
    src = pa.table({"k": pa.array(rng.randint(0, 40, 3000), pa.int64()),
                    "v": pa.array(rng.randint(0, 100, 3000), pa.int64())})
    ds = ray.data.from_arrow(src).repartition(24)
    out = pa.concat_tables(
        ray.get(hash_reduce(ds, ["k"], _make_reduce_fn(),
                            num_partitions=4,
                            max_split_tasks=3).to_arrow_refs()))
    assert _sum_by(out) == _sum_by(src)
    assert len(set(out["k"].to_pylist())) == out.num_rows


def test_exchange_block_count_slice_sizing():
    """Exchange block counts keep B x P slices ~1 MB (above Ray's direct-call
    inline threshold: smaller slices land in the DRIVER's in-process store)
    while each coalesced block stays under the worker bound."""
    from upton_ray.shuffle import (_exchange_block_count, _MAX_BLOCK_BYTES,
                                   _SLICE_TARGET_BYTES)

    # tiny dataset: single block
    assert _exchange_block_count(10_000, 8, 1024) == 1
    assert _exchange_block_count(0, 8, 1024) == 1

    # the measured 10M-doc shape: ~520 MB of payload-bearing pairs at P=80
    # previously split into 80x80 ~80 KB slices -> must now target ~1 MB
    B = _exchange_block_count(520_000_000, 80, 1024)
    assert 520_000_000 / (B * 80) >= _SLICE_TARGET_BYTES / 2
    assert 520_000_000 / B <= _MAX_BLOCK_BYTES

    # block never exceeds the worker bound even when slices would be huge
    B = _exchange_block_count(10 * _MAX_BLOCK_BYTES, 2, 1024)
    assert 10 * _MAX_BLOCK_BYTES / B <= _MAX_BLOCK_BYTES

    # respects the task cap
    assert _exchange_block_count(10**14, 512, 1024) == 1024


def test_hash_reduce_auto_partitions(ray_session):
    """num_partitions=None scales with input bytes (floor 8) and gives the
    same results as the fixed default."""
    import ray.data
    from upton_ray.shuffle import hash_reduce

    t = pa.table({"k": pa.array(list(range(100)) * 20, pa.int64()),
                  "v": pa.array(range(2000), pa.int64())})

    def agg(part: pa.Table) -> pa.Table:
        g = part.group_by("k").aggregate([("v", "sum")])
        return pa.table({"k": g["k"], "s": g["v_sum"]})

    ds = ray.data.from_arrow(t).repartition(4)
    fixed = hash_reduce(ds, ["k"], agg).to_pandas()
    auto = hash_reduce(ds, ["k"], agg, num_partitions=None).to_pandas()
    f = fixed.sort_values("k").reset_index(drop=True)
    a = auto.sort_values("k").reset_index(drop=True)
    assert f.equals(a)
    assert len(f) == 100
