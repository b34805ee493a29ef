"""Edge-case tests for the running-window / attribution operators:

- running_total: exact integer-cents cumulative sums; (ts, event_id) tie
  ordering; block-boundary torture (a user's run straddling many
  post-sort blocks goes through the residual path).
- event_lag: null for each user's first event; zero gap on equal ts;
  block straddle.
- first_last_touch: combiner fold across many small blocks (a user's
  partials land in several blocks and must fold to the global
  first/last); (ts, event_id) tie-break.
"""

import duckdb
import numpy as np

from tests.test_analysis_r4c import _con, _write_events
from tests.test_spans_hitters import _collect


def _torture_events(tmp_path):
    """User 7: 25 events, pairs sharing a ts (tie-break by event_id),
    interleaved with three tiny users — the user_path torture shape."""
    users, types, ts, eids, vals = [], [], [], [], []
    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    k = 0
    for i in range(25):
        users.append(7)
        types.append(f"t{i % 4}")
        ts.append(base + (i // 2) * sec)
        eids.append(k)
        vals.append(round(0.07 * (i + 1), 2))
        k += 1
    for u in (1, 2, 3):
        for i in range(3):
            users.append(u)
            types.append(f"u{u}e{i}")
            ts.append(base + i * sec)
            eids.append(k)
            vals.append(round(1.01 * (i + 1), 2))
            k += 1
    _write_events(tmp_path, users, ts=ts, event_types=types,
                  event_ids=eids, values=vals)


def test_running_total_exact_and_block_straddle(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    _torture_events(tmp_path)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["running_total"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    for nb in (1, 16):
        got = _collect(datapipe.running_total(str(tmp_path), num_blocks=nb)) \
            .sort_values("event_id").reset_index(drop=True)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        assert got["user_id"].tolist() == want["user_id"].tolist()
        # integer cents: exact equality, no float tolerance
        assert got["run_cents"].tolist() == want["run_cents"].tolist(), \
            f"nb={nb}"
    # user 7's final running total is the full sum of its 25 values
    u7 = got[got.user_id == 7]
    assert u7["run_cents"].max() == sum(
        round(0.07 * (i + 1) * 100) for i in range(25))


def test_event_lag_nulls_and_ties(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    _torture_events(tmp_path)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["event_lag"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    for nb in (1, 16):
        got = _collect(datapipe.event_lag(str(tmp_path), num_blocks=nb)) \
            .sort_values("event_id").reset_index(drop=True)
        g = got["gap_us"].to_numpy(dtype=float)
        w = want["gap_us"].to_numpy(dtype=float)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        assert np.array_equal(np.isnan(g), np.isnan(w)), f"nb={nb}"
        assert np.array_equal(g[~np.isnan(g)], w[~np.isnan(w)]), f"nb={nb}"
    # exactly one null per user (the first event)
    assert int(got["gap_us"].isna().sum()) == 4
    # the second event of a same-ts pair has gap 0
    by_eid = got.set_index("event_id")["gap_us"]
    assert by_eid[1] == 0.0


def test_first_last_touch_folds_across_blocks(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    # write events in REVERSE event order so per-block partials see the
    # user's later events first and the fold must fix first/last globally
    users, types, ts, eids = [], [], [], []
    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    n = 40
    for i in reversed(range(n)):
        users.append(i % 5)
        types.append(f"t{i}")
        ts.append(base + (i // 5) * sec)
        eids.append(i)
    _write_events(tmp_path, users, ts=ts, event_types=types, event_ids=eids)

    got = _collect(datapipe.first_last_touch(str(tmp_path))) \
        .sort_values("user_id").reset_index(drop=True)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["first_last_touch"]).df() \
        .sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "first_touch", "last_touch", "n_events"):
        assert got[c].tolist() == want[c].tolist(), c
    # user 0's first touch is its lowest (ts, event_id) event: t0
    assert got.set_index("user_id")["first_touch"][0] == "t0"
    assert got.set_index("user_id")["last_touch"][0] == f"t{n - 5}"
    assert got["n_events"].tolist() == [8] * 5


def test_rolling_avg_window_clamp_and_blocks(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    _torture_events(tmp_path)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["rolling_avg"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    for nb in (1, 16):
        got = _collect(datapipe.rolling_avg(str(tmp_path), num_blocks=nb)) \
            .sort_values("event_id").reset_index(drop=True)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        np.testing.assert_allclose(got["avg_cents"], want["avg_cents"],
                                   atol=1e-9)
    # a user's first event averages only itself (window clamps at start)
    by_eid = got.set_index("event_id")["avg_cents"]
    assert by_eid[0] == 7.0          # user 7's first value = 0.07 -> 7 cents
    # 4th event of user 7 averages values 1..4 (0.07*(1+2+3+4)/4*100)
    assert abs(by_eid[3] - 17.5) < 1e-9


def test_conversion_lag_first_pair_semantics(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    # u1: signup@0, purchase@5 (lag 5s); u2: purchase@2 only (excluded);
    # u3: purchase@1 then signup@4 (NEGATIVE lag kept); u4: two signups,
    # two purchases -> first of each (10 -> 12)
    users = [1, 1, 2, 3, 3, 4, 4, 4, 4]
    types = ["signup", "purchase", "purchase", "purchase", "signup",
             "signup", "signup", "purchase", "purchase"]
    offs = [0, 5, 2, 1, 4, 10, 11, 12, 13]
    ts = [base + o * sec for o in offs]
    _write_events(tmp_path, users, ts=ts, event_types=types)

    got = _collect(datapipe.conversion_lag(str(tmp_path))) \
        .sort_values("user_id").reset_index(drop=True)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["conversion_lag"]).df() \
        .sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == want["user_id"].tolist() == [1, 3, 4]
    assert got["lag_us"].tolist() == want["lag_us"].tolist()
    by_u = got.set_index("user_id")["lag_us"]
    assert by_u[1] == 5_000_000
    assert by_u[3] == -3_000_000
    assert by_u[4] == 2_000_000


def test_daily_active_users_distinct_per_day(ray_session, tmp_path):
    import __ray_entry__ as e
    from upton_ray import datapipe

    base = np.datetime64("2026-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    # day 0: users 1,1,2 (DAU 2); day 1: user 1 at 00:00 and 23:59:59
    # (counted once) + user 3 (DAU 2); day 2: user 2 (DAU 1)
    users = [1, 1, 2, 1, 1, 3, 2]
    ts = [base, base + np.timedelta64(1, "h"), base + np.timedelta64(2, "h"),
          base + day, base + 2 * day - np.timedelta64(1_000_000, "us"),
          base + day + np.timedelta64(5, "h"), base + 2 * day]
    _write_events(tmp_path, users, ts=ts)

    got = _collect(datapipe.daily_active_users(str(tmp_path))) \
        .sort_values("day").reset_index(drop=True)
    con = _con(tmp_path, ("events",))
    want = con.sql(e.oracle_sql()["daily_active_users"]).df() \
        .sort_values("day").reset_index(drop=True)
    assert got["day"].tolist() == want["day"].tolist() \
        == ["2026-01-01", "2026-01-02", "2026-01-03"]
    assert got["n_users"].tolist() == want["n_users"].tolist() == [2, 2, 1]
