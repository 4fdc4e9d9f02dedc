"""Property-based tests (hypothesis) for the pure-Python pieces:
WKT parsing/bbox and the vectorized ray-casting point-in-polygon.
No SparkSession needed — these run fast and wide.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.config import ConfigError, Country, Polygon, resolve_zone
from gbif_filter_python_spark.operators.spatial import _point_in_ring

coord = st.floats(
    min_value=-179.0, max_value=179.0, allow_nan=False, allow_infinity=False
)


def _scalar_point_in_ring(x: float, y: float, ring) -> bool:
    """Independent scalar reference implementation (classic PNPOLY)."""
    inside = False
    n = len(ring) - 1
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            x_at = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < x_at:
                inside = not inside
    return inside


@st.composite
def rings(draw):
    """Simple convex-ish rings: points sorted by angle around centroid."""
    pts = draw(
        st.lists(st.tuples(coord, coord), min_size=3, max_size=8, unique=True)
    )
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    pts.sort(key=lambda p: np.arctan2(p[1] - cy, p[0] - cx))
    return pts + [pts[0]]


@settings(max_examples=200, deadline=None)
@given(ring=rings(), x=coord, y=coord)
def test_vectorized_matches_scalar(ring, x, y):
    got = _point_in_ring(np.array([x]), np.array([y]), ring)[0]
    assert got == _scalar_point_in_ring(x, y, ring)


@settings(max_examples=100, deadline=None)
@given(ring=rings())
def test_wkt_roundtrip_and_bbox(ring):
    wkt = (
        "POLYGON(("
        + ", ".join(f"{x} {y}" for x, y in ring)
        + "))"
    )
    p = Polygon(wkt)
    parsed = p.ring()
    assert parsed == [(float(x), float(y)) for x, y in ring]
    min_lon, min_lat, max_lon, max_lat = p.bbox()
    assert min_lon <= max_lon and min_lat <= max_lat
    # every ring point inside the bbox
    assert all(min_lon <= x <= max_lon and min_lat <= y <= max_lat
               for x, y in parsed)
    # any point outside the bbox is outside the polygon
    probe = np.array([max_lon + 1.0]), np.array([max_lat + 1.0])
    assert not _point_in_ring(probe[0], probe[1], parsed)[0]


def test_horizontal_edges_warning_free():
    """Axis-aligned rectangles (all-horizontal top/bottom edges) must
    classify correctly with NO numpy floating-point warnings — the
    crossing-x division is skipped for y1 == y2 edges rather than
    evaluated-and-masked (VERDICT r4 item 3)."""
    rect = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (0.0, 5.0), (0.0, 0.0)]
    lon = np.array([5.0, 5.0, -1.0, 11.0, 5.0, 5.0])
    lat = np.array([2.5, 5.0, 2.5, 2.5, -1.0, 6.0])
    with np.errstate(all="raise"):
        got = _point_in_ring(lon, lat, rect)
    assert list(got) == [True, False, False, False, False, False]
    # Degenerate all-horizontal "ring" (zero area): nothing is inside,
    # and it must not raise or warn either.
    flat = [(0.0, 1.0), (5.0, 1.0), (9.0, 1.0), (0.0, 1.0)]
    with np.errstate(all="raise"):
        assert not _point_in_ring(lon, lat, flat).any()


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=12))
def test_country_codes_validate(code):
    import re

    if re.fullmatch(r"[A-Za-z]{2}", code):
        assert Country(code).code == code.upper()
    else:
        with pytest.raises(ConfigError):
            Country(code)


@given(st.sampled_from(["NO", "se", "De"]), st.booleans())
@settings(max_examples=20, deadline=None)
def test_zone_precedence(country, with_geom):
    geom = "POLYGON((0 0, 1 0, 1 1, 0 0))" if with_geom else None
    z = resolve_zone(country, geom)
    assert isinstance(z, Country)  # country always wins (SURVEY §2-E fix)


# ------------------------------------------------------------- r7 ops
# Invariant properties for the round-7 statistics block. These are
# SLOW-path (Spark round trip per example) so examples stay small.


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=4,
        max_size=24,
    )
)
@settings(max_examples=12, deadline=None)
def test_t_closeness_tvd_bounds_and_t1_always_passes(spark, rows):
    from gbif_filter_python_spark.operators.profile import t_closeness

    df = spark.createDataFrame(rows, "g string, s string")
    cls = t_closeness(df, ["g"], "s", mode="classes").collect()
    assert all(0.0 <= r["tvd"] <= 1.0 for r in cls)
    # TVD can never exceed 1, so t=1 always passes
    s = t_closeness(df, ["g"], "s", t=1.0).first()
    assert s["is_t_close"]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=8,
        max_size=30,
    ).filter(
        lambda rows: len({g for g, _ in rows}) == 2
        and all(
            sum(1 for g, _ in rows if g == side) >= 2
            and len({v for g, v in rows if g == side}) >= 2
            for side in ("x", "y")
        )
    )
)
@settings(max_examples=12, deadline=None)
def test_anova_f_nonnegative_and_eta_in_unit_interval(spark, rows):
    from gbif_filter_python_spark.operators.profile import anova_f

    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = anova_f(df, "g", "v").collect()
    assert r["f_stat"] >= 0.0
    assert 0.0 <= r["eta_squared"] <= 1.0


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    ),
)
@settings(max_examples=12, deadline=None)
def test_pair_eval_confusion_identities(spark, pred, truth):
    from gbif_filter_python_spark.operators.fuzzy import pair_eval

    p = spark.createDataFrame(pred, "id_a long, id_b long")
    t = spark.createDataFrame(truth, "id_a long, id_b long")
    canon_p = {tuple(sorted(x)) for x in pred if x[0] != x[1]}
    canon_t = {tuple(sorted(x)) for x in truth if x[0] != x[1]}
    if not canon_p or not canon_t:
        return  # degenerate: all self-pairs; metrics undefined
    (r,) = pair_eval(p, t).collect()
    assert r["n_pred"] == len(canon_p) and r["n_true"] == len(canon_t)
    assert r["tp"] == len(canon_p & canon_t)
    assert r["tp"] + r["fp"] == r["n_pred"]
    assert r["tp"] + r["fn"] == r["n_true"]
    assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
    assert r["f1"] <= 1.0 + 1e-9


@given(
    st.lists(
        st.tuples(
            st.integers(-5, 5),
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=3,
        max_size=15,
    )
)
@settings(max_examples=12, deadline=None)
def test_kendall_tau_bounds_and_antisymmetry(spark, rows):
    from gbif_filter_python_spark.operators.profile import kendall_tau

    import pyspark.sql.functions as SF

    df = spark.createDataFrame(rows, "x int, y double")
    xs = [x for x, _ in rows]
    ys = [y for _, y in rows]
    if len(set(xs)) < 2 or len(set(ys)) < 2:
        return  # all-tied side: tau_b denominator is 0 -> NULL
    (r,) = kendall_tau(df, "x", "y").collect()
    assert -1.0 <= r["tau_b"] <= 1.0
    # negating y flips the sign exactly (C and D swap)
    (rneg,) = kendall_tau(
        df.withColumn("y", -SF.col("y")), "x", "y"
    ).collect()
    assert abs(r["tau_b"] + rneg["tau_b"]) < 2e-6
    assert (r["concordant"], r["discordant"]) == (
        rneg["discordant"],
        rneg["concordant"],
    )
