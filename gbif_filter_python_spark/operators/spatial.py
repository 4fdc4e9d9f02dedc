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
        if y1 == y2:
            # Horizontal edge: ``(y1 > lat) != (y2 > lat)`` is
            # identically False, so the edge can never toggle
            # membership — skip it BEFORE the crossing-x division,
            # whose denominator (y2 - y1) would be zero.
            continue
        crosses = (y1 > lat) != (y2 > lat)
        # Divide ONLY the crossing lanes (``where=crosses``): on a
        # NON-crossing lane a near-horizontal edge (tiny y2 - y1) with
        # a far-away lat overflows the divide — those lanes are never
        # evaluated, keeping the suite clean under
        # ``-W error::RuntimeWarning``. The numerator is formed FIRST
        # so the op order matches classic scalar PNPOLY bit-for-bit
        # ((x2-x1)*(y-y1) then /(y2-y1)); a ratio-first formulation
        # rounds differently and flips points sitting exactly on an
        # edge (hypothesis finds them).
        num = (x2 - x1) * (lat - y1)
        x_at = (
            np.divide(num, y2 - y1, out=np.zeros_like(lat), where=crosses)
            + x1
        )
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


EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 110.574
KM_PER_DEG_LON_EQUATOR = 111.320


def haversine_km(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in km — pure Column trig (radians/sin/
    cos/asin/sqrt are all JVM intrinsics inside whole-stage codegen;
    no UDF). The formula text is mirrored verbatim by the DuckDB
    oracle so both engines order the FP ops identically."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def proximity_cell_deg(radius_km: float, max_abs_lat: float) -> float:
    """The grid cell side (degrees) :func:`proximity_pairs` uses for a
    given radius/latitude bound — exposed so cross-engine oracles can
    replay the identical cell assignment from the same double."""
    import math

    return max(
        radius_km / KM_PER_DEG_LAT,
        radius_km
        / (KM_PER_DEG_LON_EQUATOR * math.cos(math.radians(max_abs_lat))),
    )


#: Default per-cell point cap for :func:`proximity_pairs`. Any single
#: task's candidate fan-out is then bounded by ~9·k² ≈ 1.5e8 haversine
#: evaluations (seconds of JVM work), while real radius-scaled cells
#: sit orders of magnitude below it — the cap binds only on degenerate
#: density spikes (a default (0,0) coordinate, one city in a GPS dump).
DEFAULT_MAX_CELL_POINTS = 4096


def proximity_pairs(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_abs_lat: float = 85.0,
    round_dp: int = 6,
    max_cell_points: int | None = DEFAULT_MAX_CELL_POINTS,
) -> DataFrame:
    """All point pairs within ``radius_km`` great-circle distance:
    (id_a, id_b, dist_km), id_a < id_b, each pair exactly once.

    The reference's spatial story ends at server-side zone filters
    (gbif_helper.py:86-88); proximity search — "which occurrences sit
    within r km of each other" (duplicate collection events, spatial
    co-occurrence) — is the classic quadratic trap this grid join
    removes.

    Scale design — the spatial analogue of the minhash band join: a
    naive distance join is an O(n²) cross join. Instead each point
    gets an integer grid cell of side ``cell_deg`` chosen so that any
    two points within the radius differ by at most one cell in each
    axis (lat: radius/110.574 km/°; lon: the same divided by
    cos(max_abs_lat) — the WORST-case shrink of a longitude degree
    over the data's latitude range, so the guarantee is uniform).
    One side keeps its cell, the other explodes to its 3×3 neighbor
    cells, and an EQUI-join on (cx, cy) meets every qualifying pair
    exactly once (same cell → the (0,0) offset; adjacent cells → one
    offset). The exact haversine then prunes the candidate ring.
    Pair fan-out is bounded by local density (cells hold ~radius²
    worth of points), the join shuffles on integer cell keys, and
    nothing is ever quadratic in n.

    Longitude wraparound at ±180° is NOT stitched (cells on either
    side of the antimeridian never equi-join); pre-rotate longitudes
    if your data crosses it. |lat| must stay ≤ ``max_abs_lat`` for
    the one-cell guarantee — values above it raise at plan build.

    **Density cap — ``max_cell_points`` (VERDICT r4 item 4).** Pair
    fan-out per cell is quadratic in that cell's point count: one
    mega-dense cell (a city in a GPS dataset, a default (0, 0)
    coordinate) at 100 TB becomes a single straggler task emitting
    10¹²-scale pairs. With ``max_cell_points=k`` each HOME cell
    deterministically retains its k lowest-id points (one
    ``row_number`` window over the integer cell key — the same
    hot-bucket cap as ``dedup.minhash_lsh_candidates``) before the
    neighbor explode, bounding any task's pair output by ~9k²/2.
    Pairs involving dropped points are NOT emitted — an explicit,
    documented truncation exactly like the LSH cap, sized so it only
    binds on degenerate cells (set k well above the p99 cell
    occupancy). The cap is the DEFAULT (VERDICT r5 item 4:
    uncapped-by-accident must be impossible at 100 TB — one dense
    cell is a straggler task emitting a multi-TB answer); exact
    all-pairs semantics require the explicit opt-out
    ``max_cell_points=None``, appropriate for bounded inputs and
    small-sf oracle replays.
    """
    if not 0 < max_abs_lat <= 85.0:
        raise ValueError("max_abs_lat must be in (0, 85]")
    cell_deg = proximity_cell_deg(radius_km, max_abs_lat)
    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lon_col).alias("_plon"),
        F.col(lat_col).alias("_plat"),
        F.floor((F.col(lon_col) + 180.0) / cell_deg).alias("_cx"),
        F.floor((F.col(lat_col) + 90.0) / cell_deg).alias("_cy"),
    )
    if max_cell_points is not None:
        if max_cell_points < 1:
            raise ValueError("max_cell_points must be >= 1")
        from pyspark.sql import Window

        w_cap = Window.partitionBy("_cx", "_cy").orderBy(F.asc("_pid"))
        pts = (
            pts.withColumn("_rn", F.row_number().over(w_cap))
            .filter(F.col("_rn") <= max_cell_points)
            .drop("_rn")
        )
    # Half-plane neighbor explode (optimization r14, guide §2.3):
    # exploding all 9 offsets generates every candidate pair TWICE
    # (once from each endpoint's home cell) and halves it back with
    # ``_pid < _qid``. Exploding only the 5 offsets whose direction
    # set contains exactly one of each ± pair — (0,0), (0,1), (1,-1),
    # (1,0), (1,1) — generates each cross-cell pair exactly once and
    # each same-cell pair twice (both orientations of the (0,0)
    # offset, halved by the id order as before). Right-side rows and
    # join probe volume drop to 5/9; the emitted (id_a, id_b,
    # dist_km) set is identical (ids normalized with least/greatest,
    # haversine is symmetric and rounded the same).
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
            )
            for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        ]
    )
    right = (
        pts.select(
            F.col("_pid").alias("_qid"),
            F.col("_plon").alias("_qlon"),
            F.col("_plat").alias("_qlat"),
            "_cx",
            "_cy",
            F.explode(offsets).alias("_d"),
        )
        .select(
            "_qid",
            "_qlon",
            "_qlat",
            (F.col("_cx") + F.col("_d.dx")).alias("_cx"),
            (F.col("_cy") + F.col("_d.dy")).alias("_cy"),
            ((F.col("_d.dx") == 0) & (F.col("_d.dy") == 0)).alias("_same"),
        )
    )
    dist = F.round(
        haversine_km(
            F.col("_plon"), F.col("_plat"), F.col("_qlon"), F.col("_qlat")
        ),
        round_dp,
    )
    return (
        pts.join(right, ["_cx", "_cy"])
        .filter(
            F.when(
                F.col("_same"), F.col("_pid") < F.col("_qid")
            ).otherwise(F.col("_pid") != F.col("_qid"))
        )
        .select(
            F.least(F.col("_pid"), F.col("_qid")).alias("id_a"),
            F.greatest(F.col("_pid"), F.col("_qid")).alias("id_b"),
            dist.alias("dist_km"),
        )
        .filter(F.col("dist_km") <= radius_km)
    )
