"""Unit tests for the as-of and range join operators
(operators/temporal.py) — semantics edges the sf-corpus query can't
isolate: inclusive equal-ts matching, direction, tolerance, bucket
spanning, and the join-type guards."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.temporal import asof_join, range_join


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


@pytest.fixture(scope="module")
def quotes(spark):
    # key 1: quotes at minutes 0, 10; key 2: none
    return spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(10), 110.0)],
        "k long, ts timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    # key 1 trades at 0 (equal-ts), 5, 20; key 2 at 5 (no quotes)
    return spark.createDataFrame(
        [(101, 1, _ts(0)), (102, 1, _ts(5)), (103, 1, _ts(20)), (201, 2, _ts(5))],
        "trade_id long, k long, ts timestamp",
    )


class TestAsofJoin:
    def test_backward_inclusive(self, trades, quotes):
        got = {
            r["trade_id"]: r["price"]
            for r in asof_join(trades, quotes, on="k").collect()
        }
        # equal-ts quote matches (inclusive); 5 → quote@0; 20 → quote@10
        assert got == {101: 100.0, 102: 100.0, 103: 110.0, 201: None}

    def test_forward(self, trades, quotes):
        got = {
            r["trade_id"]: r["price"]
            for r in asof_join(trades, quotes, on="k", direction="forward").collect()
        }
        # 0 → quote@0 (inclusive); 5 → quote@10; 20 → nothing after
        assert got == {101: 100.0, 102: 110.0, 103: None, 201: None}

    def test_tolerance_nulls_distant_matches(self, trades, quotes):
        got = {
            r["trade_id"]: r["price"]
            for r in asof_join(
                trades, quotes, on="k", tolerance_seconds=360
            ).collect()
        }
        # trade@5 is 300 s from quote@0 (kept); trade@20 is 600 s from
        # quote@10 (nulled)
        assert got == {101: 100.0, 102: 100.0, 103: None, 201: None}

    def test_include_right_ts(self, trades, quotes):
        rows = asof_join(
            trades, quotes, on="k", include_right_ts=True
        ).collect()
        by_id = {r["trade_id"]: r["_asof_ts"] for r in rows}
        assert by_id[103] == _ts(10)
        assert by_id[201] is None

    def test_column_collision_raises(self, spark, trades):
        bad_right = spark.createDataFrame(
            [(1, _ts(0), 9)], "k long, ts timestamp, trade_id long"
        )
        with pytest.raises(ValueError, match="collide"):
            asof_join(trades, bad_right, on="k")

    def test_bad_direction(self, trades, quotes):
        with pytest.raises(ValueError, match="direction"):
            asof_join(trades, quotes, on="k", direction="nearest")


class TestAsofRandomizedOracle:
    """Seeded-random comparison against pandas.merge_asof — hundreds of
    rows, hot/cold keys, duplicate left timestamps, unmatched keys."""

    def _tables(self):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(42)
        n_l, n_r = 400, 300
        lpdf = pd.DataFrame(
            {
                "k": rng.integers(0, 8, n_l),
                "ts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
                "lid": np.arange(n_l),
            }
        )
        rpdf = (
            pd.DataFrame(
                {
                    "k": rng.integers(0, 6, n_r),  # keys 6,7 never match
                    "ts": pd.to_datetime(
                        rng.integers(0, 10_000, n_r), unit="s"
                    ),
                    "val": rng.random(n_r).round(6),
                }
            )
            .drop_duplicates(["k", "ts"])  # asof right side must be unique
            .reset_index(drop=True)
        )
        return lpdf, rpdf

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_pandas_merge_asof(self, spark, direction):
        import pandas as pd

        lpdf, rpdf = self._tables()
        expected = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("ts"),
            on="ts",
            by="k",
            direction=direction,
        )
        em = {
            int(r.lid): (None if pd.isna(r.val) else round(float(r.val), 6))
            for r in expected.itertuples()
        }
        got = asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="k",
            direction=direction,
        ).collect()
        gm = {
            int(r["lid"]): (None if r["val"] is None else round(r["val"], 6))
            for r in got
        }
        assert gm == em

    def test_tolerance_matches_pandas(self, spark):
        import pandas as pd

        lpdf, rpdf = self._tables()
        expected = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            tolerance=pd.Timedelta(seconds=500),
        )
        em = {
            int(r.lid): (None if pd.isna(r.val) else round(float(r.val), 6))
            for r in expected.itertuples()
        }
        got = asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="k",
            tolerance_seconds=500,
        ).collect()
        gm = {
            int(r["lid"]): (None if r["val"] is None else round(r["val"], 6))
            for r in got
        }
        assert gm == em


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def points(self, spark):
        return spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(15)), (3, _ts(45)), (4, _ts(59))],
            "pid long, ts timestamp",
        )

    @pytest.fixture(scope="class")
    def intervals(self, spark):
        # [0, 30) and [10, 50): point 2 (min 15) is in BOTH
        return spark.createDataFrame(
            [(10, _ts(0), _ts(30)), (20, _ts(10), _ts(50))],
            "iid long, win_start timestamp, win_end timestamp",
        )

    def test_each_pair_meets_exactly_once(self, points, intervals):
        # tiny bucket (60 s) → intervals span ~30-40 buckets each; the
        # pair set must still be exact, no duplicates
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                points, intervals, "ts", "win_start", "win_end",
                bucket_seconds=60,
            ).collect()
        )
        assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]

    def test_left_keeps_unmatched_once(self, points, intervals):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                points, intervals, "ts", "win_start", "win_end",
                bucket_seconds=60, how="left",
            ).collect()
        )
        assert got == [(1, 10), (2, 10), (2, 20), (3, 20), (4, None)]

    def test_half_open_boundaries(self, spark, intervals):
        pts = spark.createDataFrame(
            [(1, _ts(30)), (2, _ts(10))], "pid long, ts timestamp"
        )
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pts, intervals, "ts", "win_start", "win_end", bucket_seconds=600
            ).collect()
        )
        # ts == win_end excluded, ts == win_start included
        assert got == [(1, 20), (2, 10), (2, 20)]

    def test_matches_bruteforce_on_random_data(self, spark):
        """Seeded-random points/intervals vs a brute-force BETWEEN scan,
        with a bucket width that doesn't divide anything evenly."""
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        pts = pd.DataFrame(
            {
                "pid": np.arange(300),
                "ts": pd.to_datetime(rng.integers(0, 50_000, 300), unit="s"),
            }
        )
        starts = rng.integers(0, 45_000, 60)
        iv = pd.DataFrame(
            {
                "iid": np.arange(60),
                "win_start": pd.to_datetime(starts, unit="s"),
                "win_end": pd.to_datetime(
                    starts + rng.integers(1, 8_000, 60), unit="s"
                ),
            }
        )
        expected = {
            (int(p.pid), int(i.iid))
            for p in pts.itertuples()
            for i in iv.itertuples()
            if i.win_start <= p.ts < i.win_end
        }
        got = {
            (r["pid"], r["iid"])
            for r in range_join(
                spark.createDataFrame(pts),
                spark.createDataFrame(iv),
                "ts",
                "win_start",
                "win_end",
                bucket_seconds=137,
            ).collect()
        }
        assert got == expected
        assert expected  # non-vacuous

    def test_rejects_unsafe_how(self, points, intervals):
        with pytest.raises(ValueError, match="range_join supports"):
            range_join(
                points, intervals, "ts", "win_start", "win_end", how="full"
            )

    def test_rejects_column_overlap(self, spark, points):
        bad = spark.createDataFrame(
            [(1, _ts(0), _ts(30))], "pid long, win_start timestamp, win_end timestamp"
        )
        with pytest.raises(ValueError, match="overlapping"):
            range_join(points, bad, "ts", "win_start", "win_end")


class TestCogroupAsof:
    def test_matches_jvm_asof_join(self, spark):
        """Differential: the cogrouped pandas merge_asof and the
        JVM-side union+window as-of join must agree row for row."""
        from gbif_filter_python_spark.operators.cogroup import (
            asof_merge_cogrouped,
        )
        from gbif_filter_python_spark.operators.temporal import asof_join
        from gbif_filter_python_spark.sources.io import read_table
        from pyspark.sql import functions as F

        events = read_table(spark, "/root/testdata/sf0.001", "events")
        clicks = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        purchases = (
            events.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("purchase_id"))
        )
        a = {
            (r["event_id"], r["purchase_id"])
            for r in asof_join(clicks, purchases, on="user_id").collect()
        }
        b = {
            (r["event_id"], r["purchase_id"])
            for r in asof_merge_cogrouped(
                clicks, purchases, on="user_id"
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_key_with_no_right_rows_gets_nulls(self, spark):
        from gbif_filter_python_spark.operators.cogroup import (
            asof_merge_cogrouped,
        )
        import datetime

        ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
        left = spark.createDataFrame(
            [(1, 10, ts), (2, 20, ts)], "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(10, ts, 99)], "user_id long, ts timestamp, purchase_id long"
        )
        rows = {
            r["event_id"]: r["purchase_id"]
            for r in asof_merge_cogrouped(left, right, on="user_id").collect()
        }
        assert rows == {1: 99, 2: None}

    def test_right_value_name_collision_raises(self, spark):
        import datetime

        from gbif_filter_python_spark.operators.cogroup import (
            asof_merge_cogrouped,
        )

        ts = datetime.datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(1, 10, ts)], "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(10, ts, 99)], "user_id long, ts timestamp, event_id long"
        )
        with pytest.raises(ValueError, match="collide.*event_id"):
            asof_merge_cogrouped(left, right, on="user_id")


class TestEwma:
    def test_exact_recursion(self, spark):
        import datetime

        from gbif_filter_python_spark.operators.temporal import ewma

        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (1, t0, 10.0),
            (1, t0 + datetime.timedelta(hours=1), 20.0),
            (1, t0 + datetime.timedelta(hours=2), 30.0),
            (2, t0, 5.0),
        ]
        df = spark.createDataFrame(rows, "k long, ts timestamp, value double")
        out = {
            (r["k"], r["value"]): r["e"]
            for r in ewma(
                df, "k", "ts", "value", alpha=0.5,
                adjust=False, out_col="e",
            ).collect()
        }
        assert out[(1, 10.0)] == 10.0
        assert out[(1, 20.0)] == 15.0       # 0.5*20 + 0.5*10
        assert out[(1, 30.0)] == 22.5       # 0.5*30 + 0.5*15
        assert out[(2, 5.0)] == 5.0


class TestEwmaAdjustMigration:
    def test_omitting_adjust_warns_and_uses_pandas_default(self, spark):
        """ADVICE r4: the merged ewma changed the implicit default —
        omitting adjust= must warn (FutureWarning) and compute the
        adjust=True weighted-mean form."""
        import warnings

        from gbif_filter_python_spark.operators.temporal import ewma

        df = spark.createDataFrame(
            [(1, datetime.datetime(2020, 1, 1, h), float(h)) for h in range(3)],
            "user_id long, ts timestamp, value double",
        )
        with pytest.warns(FutureWarning, match="adjust"):
            implicit = ewma(df, "user_id", "ts", "value", alpha=0.5)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            explicit = ewma(
                df, "user_id", "ts", "value", alpha=0.5, adjust=True
            )
        got = sorted(r.ewma for r in implicit.collect())
        want = sorted(r.ewma for r in explicit.collect())
        assert got == pytest.approx(want, rel=1e-12)


class TestCheckConstraints:
    def test_all_constraint_kinds(self, spark):
        from gbif_filter_python_spark.operators.profile import (
            check_constraints,
        )

        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "d", 0.0)],
            "id long, name string, v double",
        )
        dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        rep = {
            r["constraint"]: (r["metric"], r["passed"])
            for r in check_constraints(
                df,
                completeness={"name": 0.7, "id": 1.0},
                unique=[["id"]],
                foreign_keys=[("id", dim, "id")],
                predicates={"v_pos": F.col("v") > 0},
            ).collect()
        }
        assert rep["completeness(name)>=0.7"] == (0.75, True)
        assert rep["completeness(id)>=1.0"] == (1.0, True)
        assert rep["unique(id)"] == (3.0, False)       # id 3 twice
        assert rep["fk(id)"] == (0.0, True)
        assert rep["predicate(v_pos)"] == (0.5, False)

    def test_fk_orphans_counted(self, spark):
        from gbif_filter_python_spark.operators.profile import (
            check_constraints,
        )

        df = spark.createDataFrame([(1,), (9,), (9,)], "fk long")
        dim = spark.createDataFrame([(1,), (2,)], "k long")
        rep = check_constraints(
            df, foreign_keys=[("fk", dim, "k")]
        ).collect()
        assert rep[0]["metric"] == 2.0 and not rep[0]["passed"]

    def test_empty_constraint_set(self, spark):
        from gbif_filter_python_spark.operators.profile import (
            check_constraints,
        )

        df = spark.createDataFrame([(1,)], "id long")
        assert check_constraints(df).count() == 0

    def test_tiny_violation_fails_despite_metric_rounding(self, spark):
        # 4 bad rows in 10M: fraction 0.9999996 rounds to metric 1.0 at
        # 6dp, but a >=1.0 completeness floor / all-rows predicate must
        # still FAIL — passed comes from exact counts, not the rounded
        # metric.
        from gbif_filter_python_spark.operators.profile import (
            check_constraints,
        )

        n = 10_000_000
        df = spark.range(n).select(
            F.when(F.col("id") % (n // 4) != 7, F.col("id")).alias("v")
        )
        rep = {
            r["constraint"]: (r["metric"], r["passed"])
            for r in check_constraints(
                df,
                completeness={"v": 1.0},
                predicates={"v_set": F.col("v").isNotNull()},
            ).collect()
        }
        assert rep["completeness(v)>=1.0"] == (1.0, False)
        assert rep["predicate(v_set)"] == (1.0, False)


class TestMergeIntervals:
    def _mi(self, spark, rows):
        from gbif_filter_python_spark.operators.temporal import (
            merge_intervals,
        )

        df = spark.createDataFrame(
            rows, "key string, start long, end long"
        )
        return sorted(
            (r.key, r.start, r.end, r.n_merged)
            for r in merge_intervals(df, "key", "start", "end").collect()
        )

    def test_overlap_touch_nested_disjoint(self, spark):
        rows = [
            # overlap + touch chain → one [0, 12]
            ("a", 0, 5),
            ("a", 3, 8),
            ("a", 8, 12),
            # disjoint
            ("a", 20, 25),
            # nested inside an earlier long interval: the enclosed
            # early end must NOT split the chain (running-max guard)
            ("b", 0, 100),
            ("b", 10, 20),
            ("b", 50, 120),
        ]
        assert self._mi(spark, rows) == [
            ("a", 0, 12, 3),
            ("a", 20, 25, 1),
            ("b", 0, 120, 3),
        ]

    def test_gap_of_one_splits(self, spark):
        # [0,5] and [6,9] do not touch under closed-interval semantics.
        assert self._mi(spark, [("k", 0, 5), ("k", 6, 9)]) == [
            ("k", 0, 5, 1),
            ("k", 6, 9, 1),
        ]

    def test_duplicate_intervals_merge(self, spark):
        assert self._mi(spark, [("k", 1, 4), ("k", 1, 4)]) == [
            ("k", 1, 4, 2)
        ]


class TestCusum:
    def test_closed_form_equals_naive_recursion(self, spark):
        """The prefix-min closed form must reproduce the textbook
        clamped recursion exactly (pre-rounding differences are pure
        fp ordering, bounded far below the 6dp quantum)."""
        import random

        from gbif_filter_python_spark.operators.temporal import (
            cusum_changepoints,
        )

        rng = random.Random(11)
        vals = [rng.uniform(0, 10) for _ in range(60)]
        rows = [("k", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "key string, ts long, value double")
        got = {
            r.ts: (r.cusum_hi, r.cusum_lo)
            for r in cusum_changepoints(
                df, "key", "ts", "value", slack=1.0, threshold=5.0
            ).collect()
        }
        mu = round(sum(vals) / len(vals), 6)
        hi = lo = 0.0
        for i, v in enumerate(vals):
            hi = max(0.0, hi + (v - mu - 1.0))
            lo = max(0.0, lo - (v - mu) - 1.0)
            assert got[i][0] == pytest.approx(round(hi, 6), abs=1e-9)
            assert got[i][1] == pytest.approx(round(lo, 6), abs=1e-9)

    def test_mean_shift_flagged_only_after_shift(self, spark):
        from gbif_filter_python_spark.operators.temporal import (
            cusum_changepoints,
        )

        # upward shift at i=30; baseline mu = 12 (global mean), so
        # the BELOW-baseline first segment accumulates on the low
        # side and the ABOVE-baseline tail on the high side — each
        # side fires only in its own regime.
        vals = [10.0] * 30 + [14.0] * 30
        rows = [("k", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "key string, ts long, value double")
        got = {
            r.ts: (r.cusum_hi, r.cusum_lo)
            for r in cusum_changepoints(
                df, "key", "ts", "value", slack=1.0, threshold=8.0
            ).collect()
        }
        assert all(got[i][0] == 0.0 for i in range(30))  # hi flat early
        assert got[59][0] > 8.0  # hi fires after the shift
        assert got[20][1] > 8.0  # lo fires in the low regime
        assert got[59][1] == 0.0  # lo fully drained by the tail


def test_cogroup_asof_matches_jvm_asof_on_events_corpus(spark, sf001_dir):
    """VERDICT r11 item 6: cogroup_asof retires from the registry (it
    was 10 s of the all-queries sweep for a documented applyInPandas
    teaching demo); THIS differential keeps its coverage — the
    per-user pandas merge_asof and the production JVM window as-of
    must produce identical (click, purchase) matches over the real
    events corpus, the exact pipeline the retired registry query ran."""
    from pyspark.sql import functions as F

    from gbif_filter_python_spark.operators.cogroup import (
        asof_merge_cogrouped,
    )
    from gbif_filter_python_spark.operators.temporal import asof_join
    from gbif_filter_python_spark.sources.io import read_table

    events = read_table(spark, sf001_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    jvm = {
        (r["event_id"], r["user_id"]): r["purchase_id"]
        for r in asof_join(clicks, purchases, on="user_id")
        .select("event_id", "user_id", "purchase_id")
        .collect()
    }
    py = {
        (r["event_id"], r["user_id"]): r["purchase_id"]
        for r in asof_merge_cogrouped(clicks, purchases, on="user_id")
        .select("event_id", "user_id", "purchase_id")
        .collect()
    }
    assert len(jvm) > 0
    assert py == jvm
