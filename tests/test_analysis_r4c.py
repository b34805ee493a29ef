"""Edge-case tests for the round-4c analysis operators:

- token_entropy: empty / whitespace-only / uniform / skewed docs vs the
  DuckDB oracle (the '' token contract shared with type_token_ratio).
- time_decay_score: multi-timestamp events vs oracle; the max-ts event
  carries weight exactly 1.
- user_path: >k-event users truncate; block-boundary torture (a user's
  run straddling many post-sort blocks goes through the residual path);
  (ts, event_id) tie ordering.
- pmi_bigrams: oracle match on a fixture with a planted collocation;
  min_count filters singletons out.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_spans_hitters import _collect, _write_docs


def _con(tmp_path, tables=("documents",)):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')")
    return con


def _write_events(tmp_path, user_ids, ts=None, event_types=None,
                  values=None, event_ids=None):
    n = len(user_ids)
    t = pa.table({
        "event_id": pa.array(
            event_ids if event_ids is not None else np.arange(n),
            pa.int64()),
        "ts": pa.array(
            ts if ts is not None
            else [np.datetime64("2026-01-01", "us")] * n,
            pa.timestamp("us")),
        "user_id": pa.array(user_ids, pa.int64()),
        "event_type": pa.array(event_types or ["view"] * n, pa.string()),
        "value": pa.array(values or [1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")


def test_token_entropy_edge_docs(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    _write_docs(tmp_path, [0, 1, 2, 3, 4], texts=[
        "",                     # splits to [''] -> entropy 0
        "   \t  ",              # whitespace-only: same
        "a b c d",              # uniform: ln(4)
        "a a a a",              # single type: 0
        "a a a b",              # skewed
    ])
    got = _collect(datapipe.token_entropy(str(tmp_path))) \
        .sort_values("doc_id").reset_index(drop=True)
    con = _con(tmp_path)
    want = con.sql(e.oracle_sql()["token_entropy"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    np.testing.assert_allclose(got["entropy"], want["entropy"], atol=1e-9)
    assert abs(got["entropy"][2] - round(np.log(4), 6)) < 1e-9
    assert got["entropy"][0] == got["entropy"][1] == got["entropy"][3] == 0.0


def test_time_decay_score_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    base = np.datetime64("2026-01-01T00:00:00", "us")
    day = np.timedelta64(86400_000_000, "us")
    ts = [base, base + day, base + 30 * day,     # user 0
          base + 30 * day,                       # user 1: only the max ts
          base + 7 * day]                        # user 2: exactly one tau
    _write_events(tmp_path, [0, 0, 0, 1, 2], ts=ts,
                  values=[2.0, 3.0, 5.0, 4.0, 1.0])
    got = _collect(datapipe.time_decay_score(str(tmp_path))) \
        .sort_values("user_id").reset_index(drop=True)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["time_decay_score"]).df() \
        .sort_values("user_id").reset_index(drop=True)
    np.testing.assert_allclose(got["decay_score"], want["decay_score"],
                               atol=1e-6)
    # the user whose single event IS the corpus max gets weight exactly 1
    assert got.set_index("user_id")["decay_score"][1] == 4.0
    # one tau back decays to exp(-23/7) for user 2 (23 days before max)
    assert abs(got.set_index("user_id")["decay_score"][2]
               - round(float(np.exp(-23 / 7)), 6)) < 1e-6


def test_user_path_truncation_and_block_straddle(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    # user 7 has 25 events (truncates to 10) interleaved with tiny users;
    # equal-ts pairs fall back to event_id order
    users, types, ts, eids = [], [], [], []
    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    k = 0
    for i in range(25):
        users.append(7)
        types.append(f"t{i % 4}")
        ts.append(base + (i // 2) * sec)   # pairs share a ts
        eids.append(k); k += 1
    for u in (1, 2, 3):
        for i in range(3):
            users.append(u)
            types.append(f"u{u}e{i}")
            ts.append(base + i * sec)
            eids.append(k); k += 1
    _write_events(tmp_path, users, ts=ts, event_types=types,
                  event_ids=eids)

    for nb in (1, 16):      # 16 blocks: user 7's run straddles many
        got = _collect(datapipe.user_path(str(tmp_path), num_blocks=nb)) \
            .sort_values("user_id").reset_index(drop=True)
        con = _con(tmp_path, ("events",))
        want = con.sql(e.oracle_sql()["user_path"]).df() \
            .sort_values("user_id").reset_index(drop=True)
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert got["path"].tolist() == want["path"].tolist(), f"nb={nb}"
        assert got["n_path"].tolist() == want["n_path"].tolist()
    assert got.set_index("user_id")["n_path"][7] == 10


def test_pmi_bigrams_planted_collocation(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    # "ice cream" always co-occurs (high PMI); "the x" pairs are spread
    # (low PMI); singleton bigrams fall under min_count=5
    texts = (["ice cream is nice"] * 6
             + [f"the w{i} runs fast today" for i in range(8)]
             + ["rare pair"] * 2)
    _write_docs(tmp_path, list(range(len(texts))), texts=texts)
    got = datapipe.pmi_bigrams(str(tmp_path)).to_pandas()
    con = _con(tmp_path)
    want = con.sql(e.oracle_sql()["pmi_bigrams"]).df()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert list(zip(got["lw"], got["rw"])) == \
        list(zip(want["lw"], want["rw"]))
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["pmi"], want["pmi"], atol=1e-9)
    assert ("rare", "pair") not in set(zip(got["lw"], got["rw"]))
    assert ("ice", "cream") in set(zip(got["lw"], got["rw"]))


def test_dsir_select_ranks_target_like_docs(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    # target domain = min(source) = "a_med": medical-jargon docs; the
    # out-of-domain docs that borrow the jargon must outrank the ones
    # that don't, and the whole frame must match the oracle (empty doc
    # included — the '' token rides both LMs)
    texts = (["dose renal dose hepatic trial" for _ in range(4)]
             + ["the cat sat on the mat"] * 3
             + ["renal dose of the day"]        # web doc w/ jargon
             + [""])                            # empty doc
    srcs = ["a_med"] * 4 + ["b_web"] * 5
    _write_docs(tmp_path, list(range(len(texts))), texts=texts,
                sources=srcs)
    got = datapipe.dsir_select(str(tmp_path)).to_pandas()
    con = _con(tmp_path)
    want = con.sql(e.oracle_sql()["dsir_select"]).df()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], atol=1e-9)
    r = got.set_index("doc_id")["rank"]
    assert r[7] < r[4], "jargon-bearing web doc must outrank plain web"


def test_retention_cohorts_matches_oracle(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    # user 0: days 0,0,3,10 (dup same-day events collapse); user 1: one
    # day only; users 2,3 share a later cohort; user 4 spans a month
    # boundary (cohort Jan 30, return Feb 2 -> offset 3)
    base = np.datetime64("2026-01-01T08:00:00", "us")
    day = np.timedelta64(86400_000_000, "us")
    users = [0, 0, 0, 0, 1, 2, 3, 3, 4, 4]
    ts = [base, base + np.timedelta64(3600_000_000, "us"),  # same day twice
          base + 3 * day, base + 10 * day,
          base + 5 * day,
          base + 2 * day, base + 2 * day, base + 4 * day,
          base + 29 * day, base + 32 * day]
    _write_events(tmp_path, users, ts=ts)
    got = datapipe.retention_cohorts(str(tmp_path)).to_pandas()
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["retention_cohorts"]).df()
    assert got["cohort_day"].tolist() == want["cohort_day"].tolist()
    assert got["day_offset"].tolist() == want["day_offset"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()
    g = got.set_index(["cohort_day", "day_offset"])["n_users"]
    assert g[("2026-01-01", 0)] == 1          # same-day dup collapsed
    assert g[("2026-01-03", 0)] == 2          # shared cohort
    assert g[("2026-01-30", 3)] == 1          # month-boundary offset
