"""Unit tests for the round-7 late block: URL canonicalization,
Poisson-bootstrap CI, compaction planning, readability scoring —
semantics edges the sf-corpus oracle queries can't isolate (http:80
default port, malformed URLs, straddling compaction bins, known-text
Flesch values, exact Poisson draw replay)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from gbif_filter_python_spark.functions.text import (
    flesch_reading_ease,
    sentence_count,
    syllable_count,
)
from gbif_filter_python_spark.functions.urls import canonicalize_url
from gbif_filter_python_spark.operators.maintenance import compaction_plan
from gbif_filter_python_spark.operators.resample import (
    POISSON1_CDF,
    poisson_bootstrap_ci,
)


# ---------------------------------------------------------------------------
# canonicalize_url
# ---------------------------------------------------------------------------


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_core_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b/",
            "https://example.com:443/a?utm_source=x&b=2&a=1#frag",
            "https://sub.example.com",
            "http://example.com:8080/keep",
        ],
    )
    assert got == [
        "http://example.com/a/b",
        "https://example.com/a?a=1&b=2",
        "https://sub.example.com/",
        "http://example.com:8080/keep",
    ]


def test_canonicalize_preserves_path_case_and_sorts_params(spark):
    (got,) = _canon(spark, ["https://A.B/Path/Case?z=1&a=2&ref=tw&gclid=x"])
    assert got == "https://a.b/Path/Case?a=2&z=1"


def test_canonicalize_strips_all_tracking_only_query(spark):
    (got,) = _canon(spark, ["https://e.com/p?utm_a=1&utm_b=2&fbclid=z"])
    assert got == "https://e.com/p"


def test_canonicalize_same_page_variants_collapse(spark):
    variants = [
        "https://www.news.site/article/42",
        "HTTPS://NEWS.SITE/article/42/",
        "https://news.site:443/article/42?utm_campaign=em#top",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_canonicalize_malformed_degrades(spark):
    # No scheme/host: degrade to path-rule round-trip, never error.
    (got,) = _canon(spark, ["not a url"])
    assert got == "://not a url"


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------


def _py_poisson_weight(rid: str, rep: int) -> int:
    """Pure-Python replay of the block/lane md5 draw: replica r reads
    lane r%4 (8 hex chars) of md5(rid|block r//4)."""
    blk, lane = rep // 4, rep % 4
    hx = hashlib.md5(f"{rid}|{blk}".encode()).hexdigest()
    u = int(hx[8 * lane : 8 * lane + 8], 16) / 2**32
    for k, c in enumerate(POISSON1_CDF):
        if u < c:
            return k
    return 8


def test_bootstrap_ci_exact_draw_replay(spark):
    rows = [("a", float(10 * i), i) for i in range(40)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = poisson_bootstrap_ci(
        df, "g", "v", "id", replicas=8, alpha=0.5
    ).collect()
    assert len(out) == 1
    got = out[0]
    # Replay every replica mean in pure Python from the same hashes.
    means = []
    for rep in range(8):
        ws = [_py_poisson_weight(str(i), rep) for _, _, i in rows]
        vs = [v for _, v, _ in rows]
        means.append(sum(w * v for w, v in zip(ws, vs)) / sum(ws))
    means.sort()

    def q7(p):  # type-7 linear interpolation, as percentile()/quantile_cont
        h = (len(means) - 1) * p
        lo = math.floor(h)
        return means[lo] + (h - lo) * (means[min(lo + 1, len(means) - 1)] - means[lo])

    assert got["point_mean"] == round(sum(10.0 * i for i in range(40)) / 40, 2)
    assert got["ci_lo"] == round(q7(0.25), 2)
    assert got["ci_hi"] == round(q7(0.75), 2)
    assert got["n_rows"] == 40


def test_poisson_hex_thresholds_are_the_cdf_bit_exactly():
    """POISSON1_HEX[k] == ceil(POISSON1_CDF[k] * 2^32) as 8-hex-char
    lowercase — so `lane_hex < HEX[k]` (string) ⟺ `lane_int/2^32 <
    CDF[k]` (double) for every 32-bit lane value: same draws as the
    pre-r8 conv()-based form, proven exactly, not statistically."""
    import math
    from fractions import Fraction

    from gbif_filter_python_spark.operators.resample import POISSON1_HEX

    for c, h in zip(POISSON1_CDF, POISSON1_HEX):
        t = math.ceil(Fraction(c) * (1 << 32))
        assert h == format(t, "08x")
        # boundary check: t-1 is below the CDF value, t is not
        assert Fraction(t - 1, 1 << 32) < Fraction(c) <= Fraction(t, 1 << 32)


def test_bootstrap_ci_brackets_the_mean_and_is_deterministic(spark):
    rows = [("g%d" % (i % 2), float(i), i) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    a = {r["grp"]: r for r in poisson_bootstrap_ci(df, "g", "v", "id").collect()}
    b = {r["grp"]: r for r in poisson_bootstrap_ci(df, "g", "v", "id").collect()}
    assert a.keys() == {"g0", "g1"}
    for g, r in a.items():
        assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"]
        assert (r["ci_lo"], r["ci_hi"]) == (b[g]["ci_lo"], b[g]["ci_hi"])


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


def test_compaction_next_fit_bins(spark):
    files = spark.createDataFrame(
        [("p", i, 60) for i in range(5)] + [("q", 0, 250)],
        ["part", "seq", "bytes"],
    )
    plan = {
        (r["part"], r["bin_id"]): r
        for r in compaction_plan(files, "part", "seq", "bytes", 100).collect()
    }
    # p: cum-starts 0,60,120,180,240 -> bins 0,0,1,1,2
    assert plan[("p", 0)]["n_files"] == 2 and plan[("p", 0)]["total_bytes"] == 120
    assert plan[("p", 1)]["n_files"] == 2
    assert plan[("p", 2)]["n_files"] == 1 and plan[("p", 2)]["last_key"] == 4
    # q: single oversized file stays a single bin 0.
    assert plan[("q", 0)]["n_files"] == 1 and plan[("q", 0)]["total_bytes"] == 250


def test_compaction_bins_reach_target_except_last(spark):
    files = spark.createDataFrame(
        [("p", i, 70) for i in range(10)], ["part", "seq", "bytes"]
    )
    rows = compaction_plan(files, "part", "seq", "bytes", 200).collect()
    last_bin = max(r["bin_id"] for r in rows)
    for r in rows:
        if r["bin_id"] != last_bin:
            assert r["total_bytes"] >= 200


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_known_text(spark):
    df = spark.createDataFrame(
        [("The cat sat on the mat. It was happy!",), ("",)], ["text"]
    )
    out = df.select(
        F.col("text"),
        sentence_count(F.col("text")).alias("s"),
        syllable_count(F.col("text")).alias("y"),
        flesch_reading_ease(F.col("text")).alias("f"),
    ).collect()
    first, empty = out
    assert first["s"] == 2
    # the(1) cat(1) sat(1) on(1) the(1) mat(1) it(1) was(1) happy(2) = 10
    assert first["y"] == 10
    expected = 206.835 - 1.015 * (9 / 2) - 84.6 * (10 / 9)
    assert first["f"] == round(expected, 4)
    assert empty["s"] == 1 and empty["f"] is None


def test_readability_fragment_counts_one_sentence(spark):
    (r,) = (
        spark.createDataFrame([("no terminators here",)], ["text"])
        .select(sentence_count(F.col("text")).alias("s"))
        .collect()
    )
    assert r["s"] == 1
