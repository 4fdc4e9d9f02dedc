"""Property tests (hypothesis, no SparkSession) for round-10 pure
pieces: the half-away rounding convention and the split-ring bbox
geometry."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.operators.similarity import _round_half_away
from gbif_filter_python_spark.sources.occurrence_source import bbox_wkt

finite = st.floats(
    min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=300, deadline=None)
@given(finite)
def test_round_half_away_matches_decimal_half_up(x):
    """Reference: Decimal ROUND_HALF_UP applied to the double's exact
    decimal expansion — what Spark's F.round (BigDecimal HALF_UP) and
    DuckDB's round() compute. The scaled-floor emulation must agree
    everywhere cosines live ([-1, 1])."""
    got = float(_round_half_away(np.array([x]), 6)[0])
    want = float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    assert got == want, (x, got, want)


def test_round_half_away_on_exact_decimal_boundary():
    # the one regime where scaled-floor COULD diverge is a value whose
    # double is exactly representable at the 5e-7 boundary — dyadic
    # ties are the real-world case (2^-k cosines) and must round AWAY
    for k in range(7, 20):
        x = 2.0**-k
        want = float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert float(_round_half_away(np.array([x]), 6)[0]) == want


lat = st.floats(min_value=-90, max_value=90, allow_nan=False)
lon = st.floats(min_value=-180, max_value=180, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat, lat, lon, lon)
def test_split_rings_partition_any_wide_span(lat_a, lat_b, lon_a, lon_b):
    """For ANY clamped bounds whose lon span exceeds 180°, the two
    rings the reader would emit each span <= 180°, share exactly the
    midpoint meridian, and jointly cover the original span."""
    lat_lo, lat_hi = min(lat_a, lat_b), max(lat_a, lat_b)
    lon_lo, lon_hi = min(lon_a, lon_b), max(lon_a, lon_b)
    if lon_hi - lon_lo <= 180.0:
        return
    mid = (lon_lo + lon_hi) / 2.0
    assert mid - lon_lo <= 180.0 and lon_hi - mid <= 180.0
    assert lon_lo <= mid <= lon_hi
    w1 = bbox_wkt(lat_lo, lat_hi, lon_lo, mid)
    w2 = bbox_wkt(lat_lo, lat_hi, mid, lon_hi)
    for w in (w1, w2):
        assert w.startswith("POLYGON((") and w.endswith("))")
        ring = [
            tuple(float(t) for t in pt.split())
            for pt in w[len("POLYGON((") : -2].split(",")
        ]
        assert len(ring) == 5 and ring[0] == ring[-1]
        xs = [p[0] for p in ring]
        assert max(xs) - min(xs) <= 180.0 + 1e-9
