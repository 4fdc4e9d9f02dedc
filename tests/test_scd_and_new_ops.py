"""Unit tests for round-2 additions: SCD2 merge, rolling stats, EWMA,
count-min sketch, per-doc char entropy, and SemDeDup-style semantic
dedup — semantics edges the sf-corpus oracle queries can't isolate."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.corpus import char_entropy
from gbif_filter_python_spark.operators.dedup import semantic_dedup
from gbif_filter_python_spark.operators.scd import latest_per_key, scd2_merge
from gbif_filter_python_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from gbif_filter_python_spark.operators.temporal import (
    ewma,
    ewma_stateful,
    rolling_stats,
)


def _d(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, 0, 0, 0)


class TestScd2Merge:
    @pytest.fixture(scope="class")
    def dim(self, spark):
        # key 1: one closed + one open version; key 2: open only;
        # key 3: open only (will change); key 4: all versions closed.
        return spark.createDataFrame(
            [
                (1, "bronze", _d(1), _d(5)),
                (1, "silver", _d(5), None),
                (2, "gold", _d(2), None),
                (3, "bronze", _d(3), None),
                (4, "gone", _d(1), _d(4)),
            ],
            "k long, tier string, valid_from timestamp, valid_to timestamp",
        )

    @pytest.fixture(scope="class")
    def merged(self, spark, dim):
        updates = spark.createDataFrame(
            [
                (3, "platinum", _d(10)),  # change
                (2, "gold", _d(10)),      # no-op (same value)
                (5, "bronze", _d(10)),    # brand-new key
                (4, "revived", _d(10)),   # key with only closed history
            ],
            "k long, tier string, effective_ts timestamp",
        )
        out = scd2_merge(dim, updates, ["k"], ["tier"])
        return {(r.k, r.tier, r.valid_from, r.valid_to) for r in out.collect()}

    def test_changed_key_closes_and_reopens(self, merged):
        assert (3, "bronze", _d(3), _d(10)) in merged
        assert (3, "platinum", _d(10), None) in merged

    def test_unchanged_update_is_noop(self, merged):
        assert (2, "gold", _d(2), None) in merged

    def test_no_update_passthrough_and_closed_history(self, merged):
        assert (1, "silver", _d(5), None) in merged
        assert (1, "bronze", _d(1), _d(5)) in merged
        assert (4, "gone", _d(1), _d(4)) in merged

    def test_new_key_and_revived_key_open(self, merged):
        assert (5, "bronze", _d(10), None) in merged
        assert (4, "revived", _d(10), None) in merged

    def test_row_count(self, merged):
        # 5 original + 1 close-split extra + 1 new + 1 revived = 8
        assert len(merged) == 8

    def test_single_open_row_per_key(self, merged):
        open_keys = [k for (k, _, _, vt) in merged if vt is None]
        assert sorted(open_keys) == [1, 2, 3, 4, 5]

    def test_null_tracked_value_is_a_change(self, spark):
        dim = spark.createDataFrame(
            [(1, None, _d(1), None)],
            "k long, tier string, valid_from timestamp, valid_to timestamp",
        )
        upd = spark.createDataFrame(
            [(1, "set", _d(2))], "k long, tier string, effective_ts timestamp"
        )
        got = {
            (r.k, r.tier, r.valid_to)
            for r in scd2_merge(dim, upd, ["k"], ["tier"]).collect()
        }
        assert (1, None, _d(2)) in got and (1, "set", None) in got

    def test_intra_batch_collapse_to_latest(self, spark, dim):
        updates = spark.createDataFrame(
            [(3, "mid", _d(8)), (3, "final", _d(9))],
            "k long, tier string, effective_ts timestamp",
        )
        out = scd2_merge(dim, updates, ["k"], ["tier"])
        rows = {(r.tier, r.valid_from, r.valid_to) for r in
                out.filter(F.col("k") == 3).collect()}
        # the intermediate "mid" state never materializes
        assert rows == {("bronze", _d(3), _d(9)), ("final", _d(9), None)}

    def test_latest_per_key_deterministic(self, spark):
        u = spark.createDataFrame(
            [(1, "a", _d(5)), (1, "b", _d(5))],
            "k long, v string, ts timestamp",
        )
        got = latest_per_key(u, ["k"], "ts").collect()
        assert len(got) == 1 and got[0].v == "a"  # tie → others asc


class TestRollingStats:
    def test_matches_pandas_rolling(self, spark):
        rows = [(1, _d(i + 1), float(x)) for i, x in
                enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = {
            r.ts: (r.roll_mean, r.roll_std, r.roll_min, r.roll_max, r.roll_n)
            for r in rolling_stats(df, n=3).collect()
        }
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["u", "ts", "v"]).sort_values("ts")
        roll = pdf["v"].rolling(3, min_periods=1)
        for ts, mean, std in zip(pdf["ts"], roll.mean(), roll.std()):
            g = got[ts]
            assert g[0] == pytest.approx(round(mean, 6), abs=1e-6)
            if not math.isnan(std):
                assert g[1] == pytest.approx(round(std, 6), abs=1e-6)

    def test_frame_shorter_than_n_at_start(self, spark):
        df = spark.createDataFrame(
            [(1, _d(1), 10.0), (1, _d(2), 20.0)],
            "user_id long, ts timestamp, value double",
        )
        first = rolling_stats(df, n=5).orderBy("ts").first()
        assert first.roll_n == 1 and first.roll_mean == 10.0


class TestEwma:
    def test_matches_pandas_ewm(self, spark):
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
        df = spark.createDataFrame(
            [(1, _d(i + 1), v) for i, v in enumerate(vals)],
            "user_id long, ts timestamp, value double",
        )
        got = [r.ewma for r in ewma(df, alpha=0.3, adjust=True).orderBy("ts").collect()]
        import pandas as pd

        want = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean().tolist()
        assert got == pytest.approx(want, rel=1e-9)

    def test_stateful_matches_closed_form(self, spark):
        rows = [(u, _d(i + 1), float((u * 7 + i * 3) % 11))
                for u in (1, 2) for i in range(20)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        a = {(r.user_id, r.ts): r.ewma for r in ewma(df, alpha=0.2, adjust=True).collect()}
        b = {(r.user_id, r.ts): r.ewma
             for r in ewma_stateful(df, alpha=0.2).collect()}
        assert set(a) == set(b)
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-9)


class TestCountMinSketch:
    @pytest.fixture(scope="class")
    def terms(self, spark):
        rows = [("alpha",)] * 50 + [("beta",)] * 20 + [("gamma",)] * 3
        return spark.createDataFrame(rows, "term string")

    def test_estimate_is_upper_bound_and_tight_when_sparse(self, spark, terms):
        sk = cms_build(terms, "term", depth=4, width=2048)
        probes = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",), ("absent",)], "term string"
        )
        est = {r.term: r.est_count
               for r in cms_estimate(sk, probes, "term", width=2048).collect()}
        # 3 distinct terms in 2048 buckets: no collisions → exact
        assert est == {"alpha": 50, "beta": 20, "gamma": 3, "absent": 0}

    def test_merge_equals_rebuild(self, spark, terms):
        half_a = spark.createDataFrame([("alpha",)] * 30 + [("beta",)] * 5,
                                       "term string")
        half_b = spark.createDataFrame([("alpha",)] * 20 + [("beta",)] * 15 +
                                       [("gamma",)] * 3, "term string")
        merged = cms_merge(cms_build(half_a, "term"), cms_build(half_b, "term"))
        direct = cms_build(terms, "term")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_sketch_size_bounded(self, spark):
        big = spark.range(10_000).select(
            F.concat(F.lit("t"), F.col("id") % 5000).alias("term")
        )
        sk = cms_build(big, "term", depth=4, width=64)
        assert sk.count() <= 4 * 64

    def test_weighted_build_equals_row_build(self, spark, terms):
        # the pre-aggregated path must produce the IDENTICAL sketch:
        # Σ weight per cell ≡ Σ 1 over the raw rows, cell for cell
        counts = terms.groupBy("term").agg(F.count("*").alias("n"))
        via_rows = cms_build(terms, "term", depth=4, width=64)
        via_weights = cms_build(
            counts, "term", depth=4, width=64, weight_col="n"
        )
        assert sorted(map(tuple, via_rows.collect())) == sorted(
            map(tuple, via_weights.collect())
        )


class TestCharEntropy:
    def test_known_distributions(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.entropy_bits, r.n_chars_counted)
               for r in char_entropy(df).collect()}
        assert got[1] == (0.0, 4)
        assert got[2] == (1.0, 4)
        assert got[3] == (2.0, 4)

    def test_degenerate_below_prose(self, spark):
        df = spark.createDataFrame(
            [(1, "zzzzzzzzzzzzzzzzzzzz"), (2, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.entropy_bits for r in char_entropy(df).collect()}
        assert got[1] < 1.0 < got[2]


class TestSemanticDedup:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # Two well-separated directions; ids 10/11 are near-copies of
        # id 1's vector, id 20 is alone in the second direction.
        rows = [
            (1, [1.0, 0.0, 0.0]),
            (10, [0.999, 0.01, 0.0]),
            (11, [0.998, -0.02, 0.0]),
            (20, [0.0, 1.0, 0.0]),
            (21, [0.0, 0.6, 0.8]),  # same cluster as 20, below threshold
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_drops_near_copies_keeps_min_id(self, corpus):
        centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        kept = semantic_dedup(corpus, centroids, threshold=0.97)
        ids = sorted(r.vec_id for r in kept.collect())
        assert ids == [1, 20, 21]

    def test_cluster_column_attached(self, corpus):
        centroids = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        kept = semantic_dedup(corpus, centroids, threshold=0.97)
        by_id = {r.vec_id: r.cluster for r in kept.collect()}
        assert by_id[1] == 0 and by_id[20] == 1

    def test_cross_cluster_pairs_never_compared(self, spark):
        # Identical vectors forced into different clusters survive:
        # SemDeDup compares within clusters only (documented behavior).
        rows = [(1, [1.0, 0.05, 0.0]), (2, [1.0, 0.05, 0.0])]
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        centroids = [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0]]
        # both assign to the SAME argmax cluster here → dup dropped
        kept = semantic_dedup(corpus, centroids, threshold=0.97)
        assert sorted(r.vec_id for r in kept.collect()) == [1]


class TestCdcApply:
    def _snapshot(self, spark):
        return spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
            "k long, v string",
        )

    def test_upsert_delete_passthrough(self, spark):
        from gbif_filter_python_spark.operators.scd import cdc_apply

        snap = self._snapshot(spark)
        changes = spark.createDataFrame(
            [
                (2, "b2", "U", _d(1)),   # update
                (3, None, "D", _d(1)),   # delete
                (9, "new", "I", _d(1)),  # insert
                (8, "x", "Q", _d(1)),    # unknown op: dropped
            ],
            "k long, v string, op string, change_ts timestamp",
        )
        got = {r["k"]: r["v"] for r in cdc_apply(snap, changes, ["k"]).collect()}
        assert got == {1: "a", 2: "b2", 4: "d", 9: "new"}

    def test_last_writer_wins_and_tie_break(self, spark):
        from gbif_filter_python_spark.operators.scd import cdc_apply

        snap = self._snapshot(spark)
        changes = spark.createDataFrame(
            [
                # same key three times: latest ts wins
                (1, "v1", "U", _d(1)),
                (1, "v2", "U", _d(2)),
                (1, "v3", "U", _d(3)),
                # delete then later re-insert: insert wins
                (2, None, "D", _d(1)),
                (2, "back", "I", _d(2)),
                # concurrent (equal-ts) delete + upsert: upsert wins
                (4, None, "D", _d(5)),
                (4, "kept", "U", _d(5)),
            ],
            "k long, v string, op string, change_ts timestamp",
        )
        got = {r["k"]: r["v"] for r in cdc_apply(snap, changes, ["k"]).collect()}
        assert got == {1: "v3", 2: "back", 3: "c", 4: "kept"}

    def test_identical_key_ts_op_resolves_by_payload_hash(self, spark):
        """ADVICE r3: rows with identical (key, ts, op) but different
        payloads have no semantic winner — the tiebreak must be the
        payload hash, so the SAME row wins regardless of input order
        or partitioning (not whichever row the shuffle delivers)."""
        from pyspark.sql import functions as F

        from gbif_filter_python_spark.operators.scd import cdc_apply

        snap = self._snapshot(spark)
        dup_rows = [
            (5, "amb1", "U", _d(1)),
            (5, "amb2", "U", _d(1)),
            (5, "amb3", "U", _d(1)),
        ]
        schema = "k long, v string, op string, change_ts timestamp"
        winners = set()
        for perm in (dup_rows, dup_rows[::-1],
                     [dup_rows[1], dup_rows[2], dup_rows[0]]):
            changes = spark.createDataFrame(perm, schema).repartition(3)
            got = {
                r["k"]: r["v"]
                for r in cdc_apply(snap, changes, ["k"]).collect()
            }
            winners.add(got[5])
        assert len(winners) == 1, winners
        # and the winner is the hash-maximal payload, not positional
        expected = (
            spark.createDataFrame(dup_rows, schema)
            .select("v", F.xxhash64("v").alias("h"))
            .orderBy(F.desc("h"))
            .first()["v"]
        )
        assert winners == {expected}

    def test_snapshot_side_never_shuffles(self, spark):
        from gbif_filter_python_spark.operators.scd import cdc_apply

        snap = self._snapshot(spark)
        changes = spark.createDataFrame(
            [(1, "x", "U", _d(1))],
            "k long, v string, op string, change_ts timestamp",
        )
        plan = (
            cdc_apply(snap, changes, ["k"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestSnapshotDiff:
    def _diff(self, spark, old_rows, new_rows, schema, **kw):
        from gbif_filter_python_spark.operators.scd import snapshot_diff

        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        return {
            r.k: r.change
            for r in snapshot_diff(old, new, ["k"], **kw).collect()
        }

    def test_all_four_classes(self, spark):
        got = self._diff(
            spark,
            [(1, "a"), (2, "b"), (3, "c")],
            [(1, "a"), (2, "B"), (4, "d")],
            "k long, v string",
        )
        assert got == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "added",
        }

    def test_null_safe_comparison(self, spark):
        got = self._diff(
            spark,
            [(1, None), (2, None), (3, "x")],
            [(1, None), (2, "y"), (3, None)],
            "k long, v string",
        )
        assert got == {1: "unchanged", 2: "changed", 3: "changed"}

    def test_null_vs_empty_string_distinct(self, spark):
        got = self._diff(
            spark,
            [(1, None), (2, "")],
            [(1, ""), (2, None)],
            "k long, v string",
        )
        assert got == {1: "changed", 2: "changed"}

    def test_compare_cols_subset_ignores_rest(self, spark):
        got = self._diff(
            spark,
            [(1, "a", 10.0)],
            [(1, "a", 99.0)],
            "k long, v string, w double",
            compare_cols=["v"],
        )
        assert got == {1: "unchanged"}

    def test_no_compare_cols_keys_only(self, spark):
        got = self._diff(
            spark,
            [(1, "a")],
            [(1, "zzz"), (2, "b")],
            "k long, v string",
            compare_cols=[],
        )
        assert got == {1: "unchanged", 2: "added"}


class TestTemporalDimJoin:
    @pytest.fixture(scope="class")
    def dim(self, spark):
        return spark.createDataFrame(
            [
                (1, "OLD", "2020-01-01", "2021-01-01"),
                (1, "NEW", "2021-01-01", None),
                (2, "ONLY", "2021-06-01", None),
            ],
            "k long, seg string, valid_from string, valid_to string",
        ).select(
            "k",
            "seg",
            F.to_date("valid_from").alias("valid_from"),
            F.to_date("valid_to").alias("valid_to"),
        )

    def _join(self, spark, dim, facts, how="left"):
        from gbif_filter_python_spark.operators.scd import (
            temporal_dim_join,
        )

        f = spark.createDataFrame(facts, "fid long, k long, ts string").select(
            "fid", "k", F.to_date("ts").alias("ts")
        )
        return {
            r.fid: r.seg
            for r in temporal_dim_join(f, dim, ["k"], "ts", how=how).collect()
        }

    def test_version_boundaries_are_from_inclusive_to_exclusive(
        self, spark, dim
    ):
        got = self._join(
            spark,
            dim,
            [
                (1, 1, "2020-06-01"),  # inside OLD
                (2, 1, "2021-01-01"),  # boundary: valid_to exclusive → NEW
                (3, 1, "2025-01-01"),  # open version
                (4, 1, "2019-01-01"),  # before history → NULL
                (5, 2, "2021-05-31"),  # day before ONLY starts → NULL
                (6, 9, "2021-01-01"),  # unknown key → NULL
            ],
        )
        assert got == {
            1: "OLD",
            2: "NEW",
            3: "NEW",
            4: None,
            5: None,
            6: None,
        }

    def test_inner_drops_unmatched_and_how_validated(self, spark, dim):
        got = self._join(
            spark, dim, [(1, 1, "2020-06-01"), (4, 1, "2019-01-01")], how="inner"
        )
        assert got == {1: "OLD"}
        from gbif_filter_python_spark.operators.scd import (
            temporal_dim_join,
        )

        f = spark.createDataFrame([(1, 1, "2020-06-01")], "fid long, k long, ts string")
        with pytest.raises(ValueError):
            temporal_dim_join(f, dim, ["k"], "ts", how="full")


class TestIncrementalViewMaintenance:
    def test_delta_join_plus_base_equals_full_join(self, spark):
        from gbif_filter_python_spark.operators.ivm import join_delta

        a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, av string")
        a_new = spark.createDataFrame([(3, "a3"), (2, "a2x")], "k long, av string")
        b_old = spark.createDataFrame([(1, "b1"), (3, "b3")], "k long, bv string")
        b_new = spark.createDataFrame([(2, "b2"), (3, "b3x")], "k long, bv string")

        full = (
            a_old.unionByName(a_new)
            .join(b_old.unionByName(b_new), "k")
        )
        maintained = a_old.join(b_old, "k").unionByName(
            join_delta(a_old, a_new, b_old, b_new, ["k"])
        )
        f = sorted(map(tuple, full.collect()))
        m = sorted(map(tuple, maintained.collect()))
        assert f == m
        # k=1: a1×b1 · k=2: {a2,a2x}×b2 · k=3: a3×{b3,b3x} → 5 rows,
        # and every one of the three delta terms contributes.
        assert len(m) == 5

    def test_merge_agg_view_adds_cells_and_validates_schema(self, spark):
        from gbif_filter_python_spark.operators.ivm import merge_agg_view

        v = spark.createDataFrame([(1, 10.0, 2), (2, 5.0, 1)], "k long, s double, n long")
        d = spark.createDataFrame([(1, 3.0, 1), (3, 7.0, 4)], "k long, s double, n long")
        got = {
            r.k: (r.s, r.n)
            for r in merge_agg_view(v, d, ["k"]).collect()
        }
        assert got == {1: (13.0, 3), 2: (5.0, 1), 3: (7.0, 4)}
        bad = d.withColumnRenamed("n", "m")
        with pytest.raises(ValueError):
            merge_agg_view(v, bad, ["k"])
