"""Spatial zone predicates (SURVEY.md §2 ops 16-17, §4.3).

The reference pushes zone predicates to the GBIF REST service as query
params (/root/reference/gbif_helper.py:86-88: ``country=``,
``geometry=``). Here the "source" is a Parquet occurrence fact, so:

* **Country** (op 16) is a plain column equality — Catalyst pushes it
  into the Parquet scan, and at cluster scale it partition-prunes a
  fact partitioned by ``country``.
* **Polygon** (op 17) is two-stage: a bounding-box range prefilter on
  plain columns (pushdown-friendly: Parquet row-group statistics and
  min/max pruning apply), then an exact vectorized ray-casting
  point-in-polygon Pandas UDF over only the bbox survivors. The UDF is
  Arrow-batched NumPy, never per-row Python, and because the bbox
  filter runs first the non-pushdownable UDF only sees a tiny
  candidate set (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from gbif_filter_python_spark.config import Country, Polygon, Zone


def country_predicate(col: Column, country: Country) -> Column:
    """op 16: ISO-2 equality; partition-prunable."""
    return col == F.lit(country.code)


def _point_in_ring(
    lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]
) -> np.ndarray:
    """Vectorized even-odd ray casting over all points at once.

    Matches the semantics GBIF applies server-side to the ``geometry``
    WKT param (gbif_helper.py:87): boundary handling follows the usual
    half-open edge convention, adequate for existence checks.
    """
    inside = np.zeros(lon.shape, dtype=bool)
    n = len(ring) - 1  # ring is closed; last point repeats the first
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        crosses = (y1 > lat) != (y2 > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lon < x_at)
    return inside


def polygon_contains_udf(polygon: Polygon):
    """Build a vectorized Pandas UDF testing point-in-polygon.

    The rings are captured in the closure (tiny — broadcast implicitly
    in the serialized task), so executors do no WKT parsing per batch.
    Multi-ring polygons use the even-odd rule: XOR of per-ring
    membership, so a point inside the outer ring AND inside a hole
    (2 rings → even) is outside the polygon.
    """
    rings = polygon.rings()

    @F.pandas_udf(BooleanType())
    def _contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lon_v = lon.to_numpy(dtype=float, na_value=np.nan)
        lat_v = lat.to_numpy(dtype=float, na_value=np.nan)
        ok = ~(np.isnan(lon_v) | np.isnan(lat_v))
        result = np.zeros(len(lon_v), dtype=bool)
        if ok.any():
            inside = np.zeros(int(ok.sum()), dtype=bool)
            for ring in rings:
                inside ^= _point_in_ring(lon_v[ok], lat_v[ok], ring)
            result[ok] = inside
        return pd.Series(result)

    return _contains


def polygon_filter(
    df: DataFrame,
    polygon: Polygon,
    lon_col: str = "decimal_lon",
    lat_col: str = "decimal_lat",
) -> DataFrame:
    """op 17: bbox Column prefilter (pushed to the scan) + exact UDF."""
    min_lon, min_lat, max_lon, max_lat = polygon.bbox()
    bbox = (
        F.col(lon_col).between(min_lon, max_lon)
        & F.col(lat_col).between(min_lat, max_lat)
    )
    contains = polygon_contains_udf(polygon)
    return df.filter(bbox).filter(contains(F.col(lon_col), F.col(lat_col)))


def _spread_bits16(c: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of 32 bits
    (classic magic-number interleave, all JVM bitwise ops)."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def morton_code(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Z-order (Morton) code of a lon/lat point — pure Column
    expressions (quantize each axis to ``bits`` bits, interleave), so
    it stays inside whole-stage codegen.

    Sorting a spatial table by this code clusters BOTH axes at once:
    parquet row-group min/max statistics on lon/lat then prune
    bbox-range scans (the polygon prefilter of :func:`polygon_filter`)
    far better than a single-column sort, which clusters only one
    axis. ``bits=16`` gives ~0.005° cells (~500 m) — finer than any
    row group, so deeper precision buys nothing.
    """
    if bits != 16:
        raise ValueError("morton_code supports bits=16")
    top = (1 << bits) - 1
    qx = F.least(
        F.lit(top),
        F.greatest(
            F.lit(0), ((lon + 180.0) / 360.0 * (1 << bits)).cast("long")
        ),
    )
    qy = F.least(
        F.lit(top),
        F.greatest(
            F.lit(0), ((lat + 90.0) / 180.0 * (1 << bits)).cast("long")
        ),
    )
    return _spread_bits16(qx).bitwiseOR(F.shiftleft(_spread_bits16(qy), 1))


def zone_filter(
    occurrences: DataFrame,
    zone: Zone | None,
    country_col: str = "country",
    lon_col: str = "decimal_lon",
    lat_col: str = "decimal_lat",
) -> DataFrame:
    """Restrict an occurrence fact to a zone (None = whole world).

    This runs *before* the existence semi-join so the join's build side
    is already minimal (SURVEY.md §4.3: filter → distinct taxon keys →
    broadcast that, turning a 100 TB-side join into a broadcast).
    """
    if zone is None:
        return occurrences
    if isinstance(zone, Country):
        return occurrences.filter(country_predicate(F.col(country_col), zone))
    return polygon_filter(occurrences, zone, lon_col=lon_col, lat_col=lat_col)
