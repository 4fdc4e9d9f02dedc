"""Event-analytics operators (operators/analytics.py): funnels,
retention cohorts, rolling active users."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.analytics import (
    funnel,
    retention_cohorts,
    rolling_active_users,
)

T0 = datetime.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + datetime.timedelta(hours=h), t) for u, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


class TestFunnel:
    def test_ordered_completion(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
                # user 2: purchase BEFORE click -> stops at click
                (2, 0, "view"), (2, 1, "purchase"), (2, 2, "click"),
                # user 3: only view
                (3, 5, "view"),
                # user 4: click without view -> nothing
                (4, 0, "click"),
            ],
        )
        out = {
            r["user_id"]: r["stages_completed"]
            for r in funnel(ev, ["view", "click", "purchase"]).collect()
        }
        assert out == {1: 3, 2: 2, 3: 1, 4: 0}

    def test_earliest_stage_times_and_strictness(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 0, "click"),  # same ts: click not after view
                (1, 3, "click"), (1, 2, "view"),
            ],
        )
        row = funnel(ev, ["view", "click"]).collect()[0]
        assert row["view_ts"] == T0
        assert row["click_ts"] == T0 + datetime.timedelta(hours=3)
        assert row["stages_completed"] == 2

    def test_retention_first_period_is_offset_zero(self, spark):
        ev = _ev(
            spark,
            [
                (1, 0, "view"), (1, 24 * 8, "view"),   # week 0 and week 1
                (2, 24 * 8, "view"),                   # first seen week 1
            ],
        )
        out = {
            (r["cohort_period"], r["period_offset"]): r["n_users"]
            for r in retention_cohorts(ev, period_days=7).collect()
        }
        cohorts = sorted({c for c, _ in out})
        first = cohorts[0]
        assert out[(first, 0)] == 1 and out[(first, 1)] == 1
        assert out[(first + 1, 0)] == 1

    def test_rolling_actives_window(self, spark):
        ev = _ev(spark, [(1, 0, "view"), (2, 24 * 3, "view")])
        out = {
            str(r["day"]): r["n_active"]
            for r in rolling_active_users(ev, window_days=7).collect()
        }
        # user 1 active Jan 1 -> contributes to window-ends Jan 1..7;
        # user 2 active Jan 4 -> Jan 4..10
        assert out["2024-01-01"] == 1
        assert out["2024-01-04"] == 2
        assert out["2024-01-07"] == 2
        assert out["2024-01-08"] == 1
        assert "2024-01-11" not in out


class TestUserEventSequences:
    def test_windows_stride_and_partial_tail(self, spark):
        import datetime

        from gbif_filter_python_spark.operators.analytics import (
            user_event_sequences,
        )

        t0 = datetime.datetime(2024, 1, 1)
        m = datetime.timedelta(minutes=1)
        rows = [(1, t0 + i * m, 100 + i) for i in range(10)] + [(2, t0, 500)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long"
        )
        got = {
            (r["user_id"], r["seq_idx"]): (list(r["items"]), r["n_items"])
            for r in user_event_sequences(df, max_len=4, stride=2).collect()
        }
        assert got[(1, 0)] == ([100, 101, 102, 103], 4)
        assert got[(1, 1)] == ([102, 103, 104, 105], 4)
        assert got[(1, 3)] == ([106, 107, 108, 109], 4)
        assert (1, 4) not in got  # history fully covered at start 6
        assert got[(2, 0)] == ([500], 1)  # short history: one window

    def test_equal_timestamps_are_deterministic(self, spark):
        import datetime

        from gbif_filter_python_spark.operators.analytics import (
            user_event_sequences,
        )

        t0 = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, t0, 7), (1, t0, 3), (1, t0, 5)],
            "user_id long, ts timestamp, event_id long",
        )
        a = user_event_sequences(df, max_len=4, stride=4).collect()
        b = user_event_sequences(
            df.repartition(5), max_len=4, stride=4
        ).collect()
        assert list(a[0]["items"]) == list(b[0]["items"]) == [3, 5, 7]


class TestSeasonalOutliers:
    def _events(self, spark, rows):
        import datetime

        data = [
            (i, datetime.datetime(2024, 1, d, h, 30), "t")
            for i, (d, h) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, "event_id long, ts timestamp, event_type string"
        )

    def test_spike_is_flagged(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            seasonal_outliers,
        )

        # hour 9 baseline: 1 event/day for 30 days, then a 20-event
        # spike on day 31 (the spike inflates its own baseline's
        # stddev, so the background must be long enough: z ~ 5.4 here)
        rows = [(d, 9) for d in range(1, 31)]
        rows += [(31, 9)] * 20
        out = {
            (r.day, r.hour): r
            for r in seasonal_outliers(
                self._events(spark, rows), key_col="event_type"
            ).collect()
        }
        import datetime as _dt

        spike = out[(_dt.date(2024, 1, 31), 9)]
        assert spike.n == 20 and spike.is_outlier
        normal = out[(_dt.date(2024, 1, 5), 9)]
        assert not normal.is_outlier

    def test_constant_traffic_never_outlier(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            seasonal_outliers,
        )

        rows = [(d, 12) for d in range(1, 8)]  # 1/day, zero variance
        out = seasonal_outliers(
            self._events(spark, rows), key_col="event_type"
        ).collect()
        assert all(not r.is_outlier for r in out)
        assert all(r.z is None for r in out)  # sd == 0 -> NULL z


class TestNegativeSamples:
    def _pos(self, spark, pairs):
        return spark.createDataFrame(pairs, "user_id long, item int")

    def test_negatives_never_positive_and_deterministic(self, spark):
        from gbif_filter_python_spark.operators.corpus import (
            negative_samples,
        )

        pairs = [(u, i) for u in range(5) for i in (u, u + 10, u + 20)]
        pos = self._pos(spark, pairs)
        got1 = sorted(
            (r.user_id, r.item, r.neg_item, r.neg_rank)
            for r in negative_samples(pos, n_items=50, k=3).collect()
        )
        got2 = sorted(
            (r.user_id, r.item, r.neg_item, r.neg_rank)
            for r in negative_samples(pos, n_items=50, k=3).collect()
        )
        assert got1 == got2  # md5 arithmetic: no rand()
        pos_set = {(u, i) for u, i in pairs}
        for u, i, n, rk in got1:
            assert (u, n) not in pos_set
            assert 0 <= n < 50 and 1 <= rk <= 3
        # every anchor got its full k (item space is sparse)
        from collections import Counter

        per_anchor = Counter((u, i) for u, i, _, _ in got1)
        assert all(v == 3 for v in per_anchor.values())

    def test_no_duplicate_negatives_per_anchor(self, spark):
        from gbif_filter_python_spark.operators.corpus import (
            negative_samples,
        )

        pos = self._pos(spark, [(1, 1), (1, 2)])
        got = negative_samples(pos, n_items=8, k=3).collect()
        seen = {}
        for r in got:
            key = (r.user_id, r.item)
            seen.setdefault(key, set())
            assert r.neg_item not in seen[key]
            seen[key].add(r.neg_item)

    def test_dense_user_degrades_gracefully(self, spark):
        from gbif_filter_python_spark.operators.corpus import (
            negative_samples,
        )

        # user holds 7 of 8 items: negatives can only be the one
        # free item, and rows may be fewer than k — never a positive
        pos = self._pos(spark, [(1, i) for i in range(7)])
        got = negative_samples(pos, n_items=8, k=3, slack=8).collect()
        assert all(r.neg_item == 7 for r in got)


class TestAssociationRules:
    def _rules(self, spark, baskets, min_support=0.1):
        from gbif_filter_python_spark.operators.analytics import (
            association_rules,
        )

        rows = [
            (b, i) for b, items in baskets.items() for i in items
        ]
        df = spark.createDataFrame(rows, "basket long, item string")
        return {
            (r.antecedent, r.consequent): (
                r.support,
                r.confidence,
                r.lift,
            )
            for r in association_rules(
                df, "basket", "item", min_support=min_support
            ).collect()
        }

    def test_textbook_values(self, spark):
        # 4 baskets: {A,B}, {A,B}, {A,C}, {C}
        baskets = {
            1: ["A", "B"],
            2: ["A", "B"],
            3: ["A", "C"],
            4: ["C"],
        }
        got = self._rules(spark, baskets, min_support=0.25)
        # supp(A,B)=0.5; conf(A→B)=2/3; lift=conf/supp(B)= (2/3)/0.5
        assert got[("A", "B")] == (0.5, round(2 / 3, 6), round(4 / 3, 6))
        # asymmetric: conf(B→A)=1.0, lift = 1.0/0.75
        assert got[("B", "A")] == (0.5, 1.0, round(1 / 0.75, 6))
        # A,C co-occur once: support 0.25 passes; C→A conf 0.5
        assert got[("C", "A")][1] == 0.5
        # duplicates of items within a basket must not inflate counts
        baskets[1] = ["A", "A", "B"]
        assert self._rules(spark, baskets, min_support=0.25)[("A", "B")][0] == 0.5

    def test_apriori_prune_drops_no_qualifying_rule(self, spark):
        # item D appears in 1 of 10 baskets (support 0.1 < 0.3): no
        # pair containing D can reach 0.3, so pruning it is lossless —
        # and the frequent pair (X, Y) survives with exact values.
        baskets = {i: ["X", "Y"] for i in range(9)}
        baskets[9] = ["X", "D"]
        got = self._rules(spark, baskets, min_support=0.3)
        assert ("X", "D") not in got and ("D", "X") not in got
        assert got[("X", "Y")] == (0.9, 0.9, 1.0)

    def test_min_support_filters_pairs(self, spark):
        baskets = {1: ["A", "B"], 2: ["A", "C"], 3: ["A", "C"], 4: ["A", "C"]}
        got = self._rules(spark, baskets, min_support=0.5)
        assert set(got) == {("A", "C"), ("C", "A")}


class TestLastTouchAttribution:
    def _attr(self, spark, rows, window_seconds=3600):
        import datetime

        from gbif_filter_python_spark.operators.analytics import (
            last_touch_attribution,
        )

        t0 = datetime.datetime(2024, 1, 1)
        data = [
            (
                uid,
                t0 + datetime.timedelta(seconds=s),
                et,
                eid,
                float(v),
            )
            for uid, s, et, eid, v in rows
        ]
        df = spark.createDataFrame(
            data,
            "user_id long, ts timestamp, event_type string, "
            "event_id long, value double",
        )
        return {
            r.conversion_id: (r.touch_id, r.touch_type)
            for r in last_touch_attribution(
                df, window_seconds=window_seconds
            ).collect()
        }

    def test_latest_touch_wins_window_and_organic(self, spark):
        rows = [
            (1, 0, "view", 10, 0),
            (1, 100, "click", 11, 0),
            (1, 200, "purchase", 12, 9.99),  # → click 11 (latest)
            (1, 5000, "purchase", 13, 5.0),  # 4800s after click → organic
            (2, 50, "purchase", 20, 1.0),  # no touches at all → organic
            (2, 60, "click", 21, 0),  # touch AFTER conversion: no credit
        ]
        got = self._attr(spark, rows)
        assert got[12] == (11, "click")
        assert got[13] == (None, None)
        assert got[20] == (None, None)

    def test_same_timestamp_touch_credits_and_tie_breaks(self, spark):
        rows = [
            (1, 100, "click", 5, 0),
            (1, 100, "view", 6, 0),  # same ts: higher event id wins
            (1, 100, "purchase", 7, 3.0),
        ]
        assert self._attr(spark, rows)[7] == (6, "view")

    def test_signup_and_error_events_never_credit(self, spark):
        rows = [
            (1, 0, "signup", 1, 0),
            (1, 10, "error", 2, 0),
            (1, 20, "purchase", 3, 2.0),
        ]
        assert self._attr(spark, rows)[3] == (None, None)


class TestSequentialPairs:
    def _df(self, spark, rows):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [
                (
                    eid,
                    base + datetime.timedelta(seconds=sec),
                    uid,
                    et,
                )
                for eid, sec, uid, et in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )

    def test_transitions_and_probability(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            sequential_pairs,
        )

        df = self._df(
            spark,
            [
                (1, 0, 1, "view"),
                (2, 10, 1, "click"),
                (3, 20, 1, "purchase"),
                (4, 0, 2, "view"),
                (5, 10, 2, "click"),
                (6, 0, 3, "view"),
                (7, 10, 3, "view"),
            ],
        )
        out = {
            (r.type_a, r.type_b): r
        for r in sequential_pairs(df, 3600).collect()
        }
        assert out[("view", "click")].n_pairs == 2
        assert out[("view", "click")].n_users == 2
        assert out[("click", "purchase")].n_pairs == 1
        assert out[("view", "view")].n_pairs == 1
        # view has 3 outgoing transitions: 2 to click, 1 to view
        assert out[("view", "click")].p_next == round(2 / 3, 6)
        # click's only outgoing transition (user 2's click is terminal)
        assert out[("click", "purchase")].p_next == 1.0

    def test_gap_cutoff_and_user_isolation(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            sequential_pairs,
        )

        df = self._df(
            spark,
            [
                (1, 0, 1, "view"),
                (2, 7200, 1, "click"),  # beyond 1h gap: no transition
                (3, 0, 2, "click"),  # last event of user 2 at t=0
                (4, 5, 3, "purchase"),  # different user: no cross-pair
            ],
        )
        assert sequential_pairs(df, 3600).count() == 0

    def test_equal_ts_ordered_by_id(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            sequential_pairs,
        )

        df = self._df(
            spark,
            [(2, 0, 1, "b"), (1, 0, 1, "a"), (3, 0, 1, "c")],
        )
        out = {
            (r.type_a, r.type_b)
            for r in sequential_pairs(df, 10).collect()
        }
        assert out == {("a", "b"), ("b", "c")}


class TestSkyline:
    def _brute(self, pts, prefs):
        def better(b, a):
            ge = all(
                (bv <= av if p == "min" else bv >= av)
                for (bv, av, p) in zip(b, a, prefs)
            )
            strict = any(
                (bv < av if p == "min" else bv > av)
                for (bv, av, p) in zip(b, a, prefs)
            )
            return ge and strict

        return sorted(
            p for p in pts if not any(better(q, p) for q in pts if q != p)
        )

    def test_matches_brute_force_3d(self, spark):
        import random

        from gbif_filter_python_spark.operators.analytics import skyline

        rng = random.Random(7)
        pts = [
            (rng.randint(0, 30), rng.randint(0, 30), rng.randint(0, 30))
            for _ in range(400)
        ]
        df = spark.createDataFrame(pts, "a int, b int, c int").repartition(8)
        out = sorted(
            tuple(r) for r in skyline(
                df, {"a": "min", "b": "max", "c": "min"}
            ).collect()
        )
        assert out == self._brute(pts, ["min", "max", "min"])

    def test_ties_all_survive_and_nulls_dropped(self, spark):
        from gbif_filter_python_spark.operators.analytics import skyline

        rows = [
            ("p1", 1, 10),
            ("p2", 1, 10),   # duplicate measures: both survive
            ("p3", 2, 10),   # dominated by p1/p2 (worse a, equal b)
            ("p4", 0, None),  # NULL measure: excluded
        ]
        df = spark.createDataFrame(rows, "id string, a int, b int")
        out = sorted(
            r["id"] for r in skyline(df, {"a": "min", "b": "max"}).collect()
        )
        assert out == ["p1", "p2"]

    def test_2d_window_path_parity(self, spark):
        import random

        from gbif_filter_python_spark.operators.analytics import (
            skyline,
            skyline_2d,
        )

        rng = random.Random(11)
        pts = [
            (i, rng.randint(0, 50), rng.randint(0, 50)) for i in range(300)
        ]
        # planted exact ties on both axes
        pts += [(1000, pts[0][1], pts[0][2]), (1001, pts[5][1], 51)]
        df = spark.createDataFrame(pts, "id int, x int, y int").repartition(5)
        a = sorted(
            r["id"] for r in skyline(df, {"x": "min", "y": "max"}).collect()
        )
        b = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
        assert a == b
        c = sorted(
            r["id"]
            for r in skyline_2d(df, "x", "y", "max", "min").collect()
        )
        d = sorted(
            r["id"] for r in skyline(df, {"x": "max", "y": "min"}).collect()
        )
        assert c == d

    def test_anti_correlated_funnel_rounds_stay_exact(self, spark):
        """VERDICT r4 item 7: adversarial anti-correlated data (large
        mutually-non-dominated front + per-point near-duplicates that
        only a CROSS-partition prune can kill). A tiny candidate
        budget forces the funnel rounds to run; the result must still
        equal brute force, for several budgets and partitionings."""
        from gbif_filter_python_spark.operators.analytics import skyline

        # front: x + y = 600 (all 300 mutually non-dominated);
        # shadows: each front point shifted (+1, +1) — dominated ONLY
        # by its own front point, which a per-partition prune misses
        # when the two land apart.
        front = [(2 * i, 600 - 2 * i) for i in range(300)]
        shadows = [(x + 1, y + 1) for x, y in front]
        pts = front + shadows
        df = spark.createDataFrame(pts, "x int, y int").repartition(16)
        want = self._brute(pts, ["min", "min"])
        for budget in (10, 150, 100_000):
            got = sorted(
                tuple(r)
                for r in skyline(
                    df, {"x": "min", "y": "min"}, candidate_budget=budget
                ).collect()
            )
            assert got == want, budget
        assert want == sorted(front)

    def test_budget_validation(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.analytics import skyline

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with _p.raises(ValueError, match="candidate_budget"):
            skyline(df, {"a": "min"}, candidate_budget=0)

    def test_rejects_bad_pref(self, spark):
        import pytest as _p

        from gbif_filter_python_spark.operators.analytics import skyline

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with _p.raises(ValueError):
            skyline(df, {"a": "best"})


class TestCuped:
    def test_matches_numpy_closed_form(self, spark):
        import numpy as np

        from gbif_filter_python_spark.operators.analytics import (
            cuped_adjusted_means,
        )

        rng = np.random.RandomState(3)
        x = rng.rand(400) * 10
        noise = rng.rand(400)
        y = 2.0 * x + noise
        arms = ["a" if i % 2 == 0 else "b" for i in range(400)]
        y[1::2] += 1.5  # treatment effect on arm b
        rows = [(a, float(xv), float(yv)) for a, xv, yv in zip(arms, x, y)]
        df = spark.createDataFrame(rows, "arm string, x double, y double")
        out = {
            r["arm"]: r
            for r in cuped_adjusted_means(df, "arm", "y", "x").collect()
        }
        theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
        for arm in ("a", "b"):
            m = np.array(arms) == arm
            adj = y[m].mean() - theta * (x[m].mean() - x.mean())
            assert abs(out[arm]["mean_adjusted"] - adj) < 1e-5
            assert abs(out[arm]["mean_raw"] - y[m].mean()) < 1e-5
        # the adjustment must tighten the arm gap toward the true
        # effect (raw gap includes covariate imbalance noise)
        raw_gap = out["b"]["mean_raw"] - out["a"]["mean_raw"]
        adj_gap = out["b"]["mean_adjusted"] - out["a"]["mean_adjusted"]
        assert abs(adj_gap - 1.5) <= abs(raw_gap - 1.5) + 1e-9

    def test_zero_variance_covariate_degrades_to_raw(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            cuped_adjusted_means,
        )

        rows = [("a", 5.0, 1.0), ("a", 5.0, 3.0), ("b", 5.0, 7.0)]
        df = spark.createDataFrame(rows, "arm string, x double, y double")
        for r in cuped_adjusted_means(df, "arm", "y", "x").collect():
            assert r["mean_adjusted"] == r["mean_raw"]

    def test_null_rows_excluded_pairwise(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            cuped_adjusted_means,
        )

        rows = [
            ("a", 1.0, 2.0),
            ("a", None, 9.0),
            ("a", 3.0, None),
            ("a", 3.0, 4.0),
        ]
        df = spark.createDataFrame(rows, "arm string, x double, y double")
        out = cuped_adjusted_means(df, "arm", "y", "x").first()
        assert out["n"] == 2 and out["mean_raw"] == 3.0


class TestDidEstimate:
    def test_hand_2x2(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            did_estimate,
        )

        # control: 10 -> 12 (+2); treated: 20 -> 27 (+7); DiD = 5
        rows = (
            [(0, 0, 9.0), (0, 0, 11.0)]
            + [(0, 1, 11.0), (0, 1, 13.0)]
            + [(1, 0, 19.0), (1, 0, 21.0)]
            + [(1, 1, 26.0), (1, 1, 28.0)]
        )
        df = spark.createDataFrame(rows, "g int, p int, v double")
        (r,) = did_estimate(df, "g", "p", "v").collect()
        assert r["n"] == 8
        assert (r["mean_c_pre"], r["mean_c_post"]) == (10.0, 12.0)
        assert (r["mean_t_pre"], r["mean_t_post"]) == (20.0, 27.0)
        assert r["did"] == 5.0
        import math

        # each cell: var 2, n 2 -> se = sqrt(4 * 2/2) = 2
        assert abs(r["se"] - 2.0) < 1e-9
        assert abs(r["t_stat"] - 5.0 / 2.0) < 1e-6

    def test_missing_cell_yields_null(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            did_estimate,
        )

        rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)]  # no (1,1)
        df = spark.createDataFrame(rows, "g int, p int, v double")
        (r,) = did_estimate(df, "g", "p", "v").collect()
        assert r["did"] is None


class TestPsmAtt:
    def test_nearest_match_and_tie_goes_backward(self, spark):
        from gbif_filter_python_spark.operators.analytics import psm_att

        # controls at scores 1 (y=10) and 5 (y=50);
        # treated at 2 (nearer 1), at 4 (nearer 5), at 3 (tie -> 1)
        rows = [
            (0, 1.0, 10.0, 1),
            (0, 5.0, 50.0, 2),
            (1, 2.0, 100.0, 3),
            (1, 4.0, 100.0, 4),
            (1, 3.0, 100.0, 5),
        ]
        df = spark.createDataFrame(rows, "t int, s double, y double, id long")
        (r,) = psm_att(df, "t", "s", "y", "id").collect()
        assert (r["n_treated"], r["n_control"], r["n_matched"]) == (3, 2, 3)
        # matched outcomes: 10, 50, 10 -> att = mean(100-10,100-50,100-10)
        assert abs(r["att"] - (90 + 50 + 90) / 3) < 1e-6
        assert abs(r["mean_matched_control"] - 70 / 3) < 0.01

    def test_caliper_drops_distant_and_equal_score_matches(self, spark):
        from gbif_filter_python_spark.operators.analytics import psm_att

        rows = [
            (0, 1.0, 10.0, 1),
            (1, 1.0, 30.0, 2),   # exact-score match, d=0
            (1, 9.0, 99.0, 3),   # nearest control 8 away
        ]
        df = spark.createDataFrame(rows, "t int, s double, y double, id long")
        (r,) = psm_att(df, "t", "s", "y", "id", caliper=2.0).collect()
        assert r["n_treated"] == 2 and r["n_matched"] == 1
        assert abs(r["att"] - 20.0) < 1e-6


class TestKendallTau:
    def test_perfect_and_reversed(self, spark):
        from gbif_filter_python_spark.operators.profile import kendall_tau

        up = spark.createDataFrame(
            [(i, float(i * 2)) for i in range(6)], "x int, y double"
        )
        (r,) = kendall_tau(up, "x", "y").collect()
        assert r["tau_b"] == 1.0 and r["concordant"] == 15

        down = spark.createDataFrame(
            [(i, float(-i)) for i in range(6)], "x int, y double"
        )
        (r2,) = kendall_tau(down, "x", "y").collect()
        assert r2["tau_b"] == -1.0

    def test_tie_correction_matches_hand_value(self, spark):
        import math

        from gbif_filter_python_spark.operators.profile import kendall_tau

        # x: 1,1,2,3  y: 1,2,2,3 — hand tau-b
        rows = [(1, 1.0), (1, 2.0), (2, 2.0), (3, 3.0)]
        df = spark.createDataFrame(rows, "x int, y double")
        (r,) = kendall_tau(df, "x", "y").collect()
        # pairs: (1,1)-(1,2) xtie; (1,1)-(2,2) C; (1,1)-(3,3) C;
        # (1,2)-(2,2) ytie; (1,2)-(3,3) C; (2,2)-(3,3) C  -> C=4, D=0
        assert (r["concordant"], r["discordant"]) == (4, 0)
        n0, n1, n2 = 6.0, 1.0, 1.0
        assert abs(r["tau_b"] - 4 / math.sqrt((n0 - n1) * (n0 - n2))) < 1e-6

    def test_max_rows_guard(self, spark):
        import pytest as _pytest

        from gbif_filter_python_spark.operators.profile import kendall_tau

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "x int, y double"
        )
        with _pytest.raises(ValueError, match="max_rows"):
            kendall_tau(df, "x", "y", max_rows=10)


    def test_did_singleton_cell_yields_null_se_not_understated(self, spark):
        from gbif_filter_python_spark.operators.analytics import (
            did_estimate,
        )

        rows = [
            (0, 0, 9.0), (0, 0, 11.0),
            (0, 1, 11.0), (0, 1, 13.0),
            (1, 0, 19.0), (1, 0, 21.0),
            (1, 1, 26.0),  # singleton treated-post cell
        ]
        df = spark.createDataFrame(rows, "g int, p int, v double")
        (r,) = did_estimate(df, "g", "p", "v").collect()
        assert r["did"] is not None  # means are all defined
        assert r["se"] is None and r["t_stat"] is None  # loud, not wrong
