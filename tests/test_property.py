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
