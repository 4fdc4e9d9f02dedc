"""Z-order (Morton) spatial clustering tests: bit-interleave parity
with an independent Python reference, and a quantified row-group
pruning comparison proving the layout claim (bbox scans touch few
row groups on a Z-sorted table, all of them on a random layout)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.operators.spatial import morton_code


def _spread(v: int) -> int:
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _ref_morton(lon: float, lat: float) -> int:
    qx = min(65535, max(0, int((lon + 180.0) / 360.0 * 65536)))
    qy = min(65535, max(0, int((lat + 90.0) / 180.0 * 65536)))
    return _spread(qx) | (_spread(qy) << 1)


def test_morton_matches_reference(spark):
    import random

    rng = random.Random(13)
    pts = [
        (i, rng.uniform(-185, 185), rng.uniform(-95, 95))  # incl. clamping
        for i in range(500)
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", morton_code(F.col("lon"), F.col("lat")).alias("z")
        ).collect()
    }
    for i, lon, lat in pts:
        assert got[i] == _ref_morton(lon, lat), (i, lon, lat)


def test_morton_rejects_other_bit_widths():
    with pytest.raises(ValueError):
        morton_code(F.col("a"), F.col("b"), bits=8)


def _row_groups_intersecting(d: str, bbox) -> tuple[int, int]:
    """(intersecting, total) row groups whose lon/lat min-max stats
    overlap the bbox — what a parquet reader's predicate pushdown
    would have to read."""
    import pyarrow.parquet as pq

    min_lon, min_lat, max_lon, max_lat = bbox
    hit = total = 0
    for f in glob.glob(f"{d}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            stats = {}
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                stats[col.path_in_schema] = col.statistics
            lon_s, lat_s = stats["lon"], stats["lat"]
            if (
                lon_s.min <= max_lon
                and lon_s.max >= min_lon
                and lat_s.min <= max_lat
                and lat_s.max >= min_lat
            ):
                hit += 1
    return hit, total


def test_zorder_layout_prunes_bbox_scans(spark, tmp_path):
    """60k uniform points, 16 files each: a ~2% bbox intersects only a
    fraction of the Z-sorted files' stats ranges but ~all of the
    randomly-laid-out ones."""
    n = 60_000
    pts = spark.range(n).select(
        (F.rand(1) * 360 - 180).alias("lon"),
        (F.rand(2) * 180 - 90).alias("lat"),
    )
    zdir = str(tmp_path / "zsorted")
    rdir = str(tmp_path / "random")
    (
        pts.withColumn("_z", morton_code(F.col("lon"), F.col("lat")))
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    pts.repartition(16).write.mode("overwrite").parquet(rdir)

    bbox = (5.0, 58.0, 12.0, 62.0)  # the Norway-ish test zone
    z_hit, z_total = _row_groups_intersecting(zdir, bbox)
    r_hit, r_total = _row_groups_intersecting(rdir, bbox)
    assert z_total >= 16 and r_total >= 16
    # random layout: essentially every row group spans the world
    assert r_hit >= r_total - 1
    # Z-sorted: the bbox touches a small minority
    assert z_hit <= z_total // 2, (z_hit, z_total)

    # correctness: both layouts return identical bbox row counts
    def _count(d):
        return (
            spark.read.parquet(d)
            .filter(
                F.col("lon").between(bbox[0], bbox[2])
                & F.col("lat").between(bbox[1], bbox[3])
            )
            .count()
        )

    assert _count(zdir) == _count(rdir)


def test_write_spatial_snapshot_roundtrip(spark, occurrence):
    """The spatial snapshot layout preserves content and stays
    readable through the standard snapshot reader."""
    import tempfile

    from gbif_filter_python_spark.sources.io import (
        read_occurrence_snapshot,
        write_spatial_snapshot,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/occ_spatial"
        write_spatial_snapshot(occurrence, path)
        back = read_occurrence_snapshot(spark, path)
        assert back.count() == occurrence.count()
        assert sorted(back.columns) == sorted(occurrence.columns)
