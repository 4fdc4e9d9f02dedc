"""DataSketches operator invariants: HLL merge losslessness and
accuracy, Theta set algebra vs exact, KLL rank error, approx_top_k
exactness under sufficient budget.

The sketch estimates are engine-specific (no DuckDB oracle), so these
invariants ARE the correctness story for operators/sketches.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.sketches import (
    approx_top_terms,
    hll_merge_estimate,
    hll_rollup,
    kll_quantiles,
    theta_overlap,
)


@pytest.fixture(scope="module")
def events(spark):
    # 3 days x 4 event types; user u visits day d iff u % (d+2) == 0 —
    # deterministic, overlapping cohorts.
    rows = []
    for day in range(3):
        for et in ("click", "purchase", "view", "error"):
            for u in range(200):
                if (u + hash(et) % 7) % (day + 2) == 0:
                    rows.append((f"2024-01-0{day+1}", et, u, float(u % 50)))
    return spark.createDataFrame(rows, ["day", "event_type", "user_id", "value"])


class TestHll:
    def test_merge_is_lossless(self, events):
        """Estimating from the merged fine rollup must equal the
        estimate of a sketch built directly on the raw data — HLL
        union is exact on registers."""
        fine = hll_rollup(events, ["day", "event_type"], "user_id")
        via_rollup = {
            r["day"]: r["est_distinct"]
            for r in hll_merge_estimate(fine, ["day"]).collect()
        }
        direct = {
            r["day"]: r["est"]
            for r in events.groupBy("day")
            .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").alias("est"))
            .collect()
        }
        assert via_rollup == direct

    def test_estimate_close_to_exact(self, events):
        fine = hll_rollup(events, ["day", "event_type"], "user_id")
        est = {
            r["day"]: r["est_distinct"]
            for r in hll_merge_estimate(fine, ["day"]).collect()
        }
        exact = {
            r["day"]: r["n"]
            for r in events.groupBy("day")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for day, n in exact.items():
            assert abs(est[day] - n) <= max(2, 0.05 * n)

    def test_global_merge(self, events):
        fine = hll_rollup(events, ["day", "event_type"], "user_id")
        est = hll_merge_estimate(fine, []).first()["est_distinct"]
        exact = events.select("user_id").distinct().count()
        assert abs(est - exact) <= max(2, 0.05 * exact)


class TestTheta:
    def test_overlap_matches_exact_sets(self, events):
        r = theta_overlap(
            events, "event_type", "user_id", "click", "purchase"
        ).first()
        a = {
            x["user_id"]
            for x in events.filter(F.col("event_type") == "click")
            .select("user_id")
            .distinct()
            .collect()
        }
        b = {
            x["user_id"]
            for x in events.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct()
            .collect()
        }
        # theta is exact below its nominal-entries threshold (4096)
        assert r["est_a"] == len(a)
        assert r["est_b"] == len(b)
        assert r["est_intersection"] == len(a & b)
        assert r["est_union"] == len(a | b)


class TestKll:
    def test_rank_error_bound(self, events):
        got = kll_quantiles(events, "event_type", "value", (0.5, 0.95)).first()
        exact = events.agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        ).first()
        # k=200 → ~1.65% rank error; values are 0..49 so translate a
        # generous rank tolerance into value space.
        assert abs(got["p50"] - exact["p50"]) <= 3.0
        assert abs(got["p95"] - exact["p95"]) <= 3.0

    def test_merged_equals_direct_for_exact_regime(self, spark):
        # fewer values than k → the sketch stores all of them: merged
        # per-group sketches must reproduce exact quantiles.
        df = spark.createDataFrame(
            [(i % 4, float(i)) for i in range(100)], ["g", "v"]
        )
        got = kll_quantiles(df, "g", "v", (0.5,), k=200).first()
        assert got["p50"] == 49.0 or got["p50"] == 50.0


class TestApproxTopK:
    def test_exact_when_budget_sufficient(self, spark):
        docs = spark.createDataFrame(
            [
                (1, ["apple"] * 5 + ["pear"] * 3 + ["plum"]),
                (2, ["apple"] * 2 + ["pear"] * 4 + ["quince"]),
                (3, ["apple"] * 1 + ["fig"] * 2),
            ],
            ["doc_id", "words"],
        )
        got = [
            (r["term"], r["est_count"])
            for r in approx_top_terms(
                docs, F.col("words"), k=3, max_items_tracked=100
            ).collect()
        ]
        assert got == [("apple", 8), ("pear", 7), ("fig", 2)]

    def test_superset_recall_on_heavy_hitter(self, spark):
        # even with a tight budget the single dominant term survives
        rows = [(i, ["dominant"] * 20 + [f"rare{i}"]) for i in range(50)]
        docs = spark.createDataFrame(rows, ["doc_id", "words"])
        got = approx_top_terms(
            docs, F.col("words"), k=1, max_items_tracked=10
        ).first()
        assert got["term"] == "dominant"
        assert got["est_count"] >= 1000


class TestRollupMaintenance:
    def test_incremental_merge_equals_full_recompute(self, spark):
        """The mergeability contract: union of per-increment rollups
        merged coarse == rollup of all raw data merged coarse — for
        count/sum/min/max exactly, for HLL distinct exactly below
        sketch capacity."""
        from gbif_filter_python_spark.operators.sketches import (
            build_rollup,
            merge_rollup,
        )
        from gbif_filter_python_spark.sources.io import read_table
        from pyspark.sql import functions as F

        ev = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
            "day", F.to_date("ts")
        )
        a = ev.filter(F.col("event_id") % 3 == 0)
        b = ev.filter(F.col("event_id") % 3 != 0)
        inc = build_rollup(a, ["day"], "value", "user_id").unionByName(
            build_rollup(b, ["day"], "value", "user_id")
        )
        got = {
            r["day"]: (r["n_rows"], round(r["sum_value"], 6),
                       r["min_value"], r["max_value"], r["est_distinct"])
            for r in merge_rollup(inc, ["day"]).collect()
        }
        want = {
            r["day"]: (r["n_rows"], round(r["sum_value"], 6),
                       r["min_value"], r["max_value"], r["est_distinct"])
            for r in merge_rollup(
                build_rollup(ev, ["day"], "value", "user_id"), ["day"]
            ).collect()
        }
        assert got == want and len(got) > 5
