"""Pushdown-capable gbif_occurrences DataSource (sources/
occurrence_source.py) — closes SURVEY §7.3's deferred DataSourceV2
item. Hermetic throughout: the scripted fetch records every call to a
file (worker processes can't mutate test globals), so pushdown is
asserted by the PARAMETERS that reached the transport, not inferred
from results."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.sources.occurrence_source import (
    GbifOccurrencesDataSource,
    ScriptedOccurrenceFetch,
)

DATA = {
    "100|FR|": [
        {
            "taxon_key": 100,
            "occurrence_key": 1,
            "scientific_name": "Aus aus",
            "country": "FR",
            "decimal_latitude": 1.0,
            "decimal_longitude": 2.0,
        },
        {
            "taxon_key": 100,
            "occurrence_key": 3,
            "scientific_name": "Aus aus",
            "country": "FR",
            "decimal_latitude": 48.0,
            "decimal_longitude": 2.3,
        },
    ],
    "200|FR|": [
        {
            "taxon_key": 200,
            "occurrence_key": 2,
            "scientific_name": "Bus bus",
            "country": "FR",
            "decimal_latitude": 3.0,
            "decimal_longitude": 4.0,
        }
    ],
    "100||": [
        {
            "taxon_key": 100,
            "occurrence_key": 9,
            "scientific_name": "Aus aus",
            "country": "DE",
            "decimal_latitude": 0.0,
            "decimal_longitude": 0.0,
        }
    ],
}


@pytest.fixture()
def pushdown(spark):
    spark.dataSource.register(GbifOccurrencesDataSource)
    old = spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false"
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def _reader(spark, tmp_path, **extra):
    log = str(tmp_path / "calls.jsonl")
    r = (
        spark.read.format("gbif_occurrences")
        .option(
            "fetch_factory",
            "gbif_filter_python_spark.sources."
            "occurrence_source:scripted_occurrence_fetch",
        )
        .option("fetch_args", json.dumps({"data": DATA, "call_log": log}))
    )
    for k, v in extra.items():
        r = r.option(k, v)
    return r, log


def _calls(log):
    if not os.path.exists(log):
        return []
    return [json.loads(line) for line in open(log)]


class TestPushdown:
    def test_in_and_equality_become_rest_params(self, pushdown, tmp_path):
        r, log = _reader(pushdown, tmp_path)
        df = (
            r.load()
            .filter(F.col("taxon_key").isin(100, 200))
            .filter(F.col("country") == "FR")
        )
        rows = sorted(
            (x["taxon_key"], x["occurrence_key"]) for x in df.collect()
        )
        assert rows == [(100, 1), (100, 3), (200, 2)]
        # one partition per pushed taxon key
        assert df.rdd.getNumPartitions() == 2
        # the transport saw country=FR per taxon — pushdown REACHED the
        # source; without it the source would have raised (no keys)
        assert sorted(
            (c["taxon_key"], c["country"]) for c in _calls(log)
        ) == [(100, "FR"), (200, "FR")]

    def test_residual_filters_stay_spark_side(self, pushdown, tmp_path):
        r, log = _reader(pushdown, tmp_path)
        df = (
            r.load()
            .filter(F.col("taxon_key") == 100)
            .filter(F.col("country") == "FR")
            .filter(F.col("decimal_latitude") > 10.0)
        )
        rows = df.collect()
        assert [x["occurrence_key"] for x in rows] == [3]
        # latitude never reached the transport — it's residual
        calls = _calls(log)
        assert calls and all("decimal_latitude" not in c for c in calls)
        assert all(c["taxon_key"] == 100 for c in calls)

    def test_unbounded_scan_raises_loudly(self, pushdown, tmp_path):
        r, _ = _reader(pushdown, tmp_path)
        with pytest.raises(Exception, match="unbounded|taxon_key"):
            r.load().collect()

    def test_option_keys_work_without_filters(self, pushdown, tmp_path):
        # no DataFrame filters at all: keys and country arrive as
        # reader options (the explicit-config path)
        r, log = _reader(
            pushdown, tmp_path, taxon_keys="100,200", country="FR"
        )
        df = r.load()
        assert df.count() == 3
        assert df.rdd.getNumPartitions() == 2

    def test_disabled_conf_is_a_loud_error(self, spark, tmp_path):
        # Spark refuses a pushFilters-implementing reader outright
        # when the conf is off — which is why get_spark() sets it as
        # a session default; pin the failure mode so a conf
        # regression can't silently change semantics
        spark.dataSource.register(GbifOccurrencesDataSource)
        old = spark.conf.get(
            "spark.sql.python.filterPushdown.enabled", "false"
        )
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "false"
        )
        try:
            r, _ = _reader(spark, tmp_path, taxon_keys="100")
            with pytest.raises(Exception, match="PUSHDOWN_DISABLED"):
                r.load().collect()
        finally:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", old
            )

    def test_limit_per_taxon_truncates(self, pushdown, tmp_path):
        r, log = _reader(pushdown, tmp_path, limit_per_taxon="1")
        df = (
            r.load()
            .filter(F.col("taxon_key") == 100)
            .filter(F.col("country") == "FR")
        )
        assert [x["occurrence_key"] for x in df.collect()] == [1]
        assert _calls(log)[0]["limit"] == 1

    def test_conflicting_key_filters_intersect(self, pushdown, tmp_path):
        r, log = _reader(pushdown, tmp_path)
        df = (
            r.load()
            .filter(F.col("taxon_key").isin(100, 200))
            .filter(F.col("taxon_key") == 200)
            .filter(F.col("country") == "FR")
        )
        assert [x["occurrence_key"] for x in df.collect()] == [2]
        assert [c["taxon_key"] for c in _calls(log)] == [200]


class TestScriptedFetch:
    def test_keying_and_limit(self, tmp_path):
        f = ScriptedOccurrenceFetch(DATA)
        assert len(f(100, "FR", None, 10)) == 2
        assert len(f(100, "FR", None, 1)) == 1
        assert f(100, None, None, 10)[0]["country"] == "DE"
        assert f(999, "FR", None, 10) == []

    def test_empty_pushdown_intersection_is_empty_scan(self, pushdown, tmp_path):
        # option keys {100,200} intersected with filter key 300 -> []
        # is a CONSTRAINED-but-empty scan: 0 rows, not an error
        r, _ = _reader(pushdown, tmp_path, taxon_keys="100,200")
        df = r.load().filter(F.col("taxon_key") == 300)
        assert df.count() == 0
