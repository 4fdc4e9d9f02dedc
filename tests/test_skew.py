"""Salted-join / two-phase-agg equivalence tests (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 rows of hot key 1, 100 spread keys
    rows = [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k long, v long")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 102)], "k2 long, name string"
    )


def test_salted_join_equals_plain_join(skewed, dim):
    plain = (
        skewed.join(dim, skewed["k"] == dim["k2"])
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join(skewed, dim, "k", "k2", salt=4)
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched(spark, dim):
    left = spark.createDataFrame([(1, 10), (999, 20)], "k long, v long")
    out = salted_join(left, dim, "k", "k2", salt=3, how="left")
    rows = {r["k"]: r["name"] for r in out.collect()}
    assert rows == {1: "name1", 999: None}
    assert out.count() == 2  # unmatched row appears exactly once


def test_two_phase_agg_matches_direct(skewed):
    direct = {
        (r["k"],): (r["n"], r["s"], r["mn"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn")
        )
        .collect()
    }
    two = {
        (r["k"],): (r["count_v"], r["sum_v2"], r["min_v3"])
        for r in two_phase_agg(
            skewed.withColumns({"v2": F.col("v"), "v3": F.col("v")}),
            ["k"],
            {"v": "count", "v2": "sum", "v3": "min"},
        ).collect()
    }
    assert direct == two


def test_two_phase_agg_rejects_non_associative():
    with pytest.raises(ValueError):
        two_phase_agg(None, ["k"], {"v": "avg"})


@pytest.mark.parametrize("how", ["right", "full", "left_anti", "left_semi"])
def test_salted_join_rejects_unsafe_how(skewed, dim, how):
    """The right side is exploded per salt value, so any join shape
    that can emit unmatched right rows (or tests membership against
    the salted condition) is wrong — reject loudly."""
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", "k2", salt=4, how=how)


class TestBloomPrefilterJoin:
    def test_equals_plain_join_and_prunes_fact(self, spark):
        from gbif_filter_python_spark.operators.skew import (
            bloom_prefilter_join,
        )

        fact = spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("v")
        )
        # selective dim: 1% of fact keys match
        dim = spark.range(500).select(
            (F.col("id") * 100).alias("dk"), F.lit("d").alias("name")
        )
        out = bloom_prefilter_join(fact, dim, "k", "dk", expected_items=500)
        plain = fact.join(dim, fact["k"] == dim["dk"])
        assert out.exceptAll(plain).count() == 0
        assert plain.exceptAll(out).count() == 0

    def test_false_positive_rate_bounded(self, spark):
        from gbif_filter_python_spark.operators.skew import (
            bloom_prefilter_join,
        )

        fact = spark.range(50_000).select(F.col("id").alias("k"))
        dim = spark.range(500).select((F.col("id") * 100).alias("dk"))
        semi = bloom_prefilter_join(
            fact, dim, "k", "dk", expected_items=500, fpp=0.01,
            how="left_semi",
        )
        # left_semi of the REAL join: exactly the 500 true matches
        # (false positives are removed by the join itself)
        assert semi.count() == 500

    def test_rejects_outer_joins(self, spark):
        from gbif_filter_python_spark.operators.skew import (
            bloom_prefilter_join,
        )

        df = spark.range(1).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="inner/left_semi"):
            bloom_prefilter_join(df, df, "k", "k", how="left")
