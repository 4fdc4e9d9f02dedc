"""GBIF-pipeline scale benchmark.

The driver bench (bench.py) times the star-schema operator queries;
this script times the engine's own domain pipeline at a GBIF-shaped
scale: a deterministic synthetic backbone (~50k taxa) + occurrence
fact (default 2M rows, --rows to change) written in the snapshot
layout, then `run_filter` (resolution → zone semi-probe → ternary
tag) over a 20k-row taxa input, in all three modes (country zone,
polygon zone, expansion).

Usage: python tools/bench_gbif.py [--rows 2000000] [--keep]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gbif_filter_python_spark.config import Country, FilterConfig, Polygon
from gbif_filter_python_spark.engine import OccurrenceEngine
from gbif_filter_python_spark.schemas import BACKBONE_DATASET_KEY
from gbif_filter_python_spark.session import get_spark
from gbif_filter_python_spark.sources.io import (
    write_occurrence_snapshot,
    write_spatial_snapshot,
)

N_FAMILIES = 500
GENERA_PER_FAMILY = 10
SPECIES_PER_GENUS = 9  # ~50k total taxa
COUNTRIES = ["NO", "SE", "DE", "FR", "ES", "GB", "US", "BR", "AU", "ZA"]
POLY = "POLYGON((5 55, 15 55, 15 65, 5 65, 5 55))"


def build_taxonomy(spark):
    fam = spark.range(N_FAMILIES).select(
        (F.lit(10_000_000) + F.col("id")).alias("key"),
        F.lit(1).cast("long").alias("parent_key"),
        F.concat(F.lit("Familia"), F.col("id")).alias("canonical_name"),
        F.lit("FAMILY").alias("rank"),
    )
    gen = (
        spark.range(N_FAMILIES * GENERA_PER_FAMILY)
        .select(
            (F.lit(20_000_000) + F.col("id")).alias("key"),
            (F.lit(10_000_000) + (F.col("id") / GENERA_PER_FAMILY).cast("long"))
            .alias("parent_key"),
            F.concat(F.lit("Genus"), F.col("id")).alias("canonical_name"),
            F.lit("GENUS").alias("rank"),
        )
    )
    n_species = N_FAMILIES * GENERA_PER_FAMILY * SPECIES_PER_GENUS
    spc = spark.range(n_species).select(
        (F.lit(30_000_000) + F.col("id")).alias("key"),
        (F.lit(20_000_000) + (F.col("id") / SPECIES_PER_GENUS).cast("long"))
        .alias("parent_key"),
        F.concat(F.lit("Species"), F.col("id")).alias("canonical_name"),
        F.lit("SPECIES").alias("rank"),
    )
    tax = fam.unionByName(gen).unionByName(spc).select(
        "key",
        "parent_key",
        "canonical_name",
        "rank",
        F.lit("Animalia").alias("kingdom"),
        # every 20th species is a synonym of its neighbor
        F.when((F.col("rank") == "SPECIES") & (F.col("key") % 20 == 0),
               F.lit("SYNONYM")).otherwise(F.lit("ACCEPTED"))
        .alias("taxonomic_status"),
        ((F.col("rank") == "SPECIES") & (F.col("key") % 20 == 0))
        .alias("is_synonym"),
        F.when((F.col("rank") == "SPECIES") & (F.col("key") % 20 == 0),
               F.col("key") + 1).alias("accepted_key"),
        F.element_at(
            F.array(F.lit("TERRESTRIAL"), F.lit("FRESHWATER"), F.lit("MARINE")),
            (F.col("key") % 3 + 1).cast("int"),
        ).alias("habitat"),
        F.lit(BACKBONE_DATASET_KEY).alias("dataset_key"),
    )
    return tax


def build_occurrence(spark, n_rows: int):
    n_species = N_FAMILIES * GENERA_PER_FAMILY * SPECIES_PER_GENUS
    return spark.range(n_rows).select(
        F.col("id").alias("occurrence_id"),
        # xxhash-spread taxon assignment; ~60% of species ever occur,
        # with a skewed hot head (mega-taxa)
        (
            F.lit(30_000_000)
            + F.when(
                F.col("id") % 10 < 3,
                F.pmod(F.xxhash64("id"), 100),  # 30% of rows on 100 hot taxa
            ).otherwise(F.pmod(F.xxhash64(F.col("id") + 1), int(n_species * 0.6)))
        ).alias("taxon_key"),
        F.lit("SPECIES").alias("taxon_rank"),
        F.element_at(
            F.array(*[F.lit(c) for c in COUNTRIES]),
            (F.pmod(F.xxhash64(F.col("id") + 2), len(COUNTRIES)) + 1).cast("int"),
        ).alias("country"),
        (F.pmod(F.xxhash64(F.col("id") + 3), 3600) / 100.0 - 8.0).alias(
            "decimal_lon"
        ),
        (F.pmod(F.xxhash64(F.col("id") + 4), 1600) / 100.0 + 52.0).alias(
            "decimal_lat"
        ),
        F.timestamp_seconds(F.lit(1577836800) + F.pmod(F.xxhash64("id"), 86400 * 365))
        .alias("event_ts"),
    )


def build_taxa_input(spark, n: int = 20000):
    n_species = N_FAMILIES * GENERA_PER_FAMILY * SPECIES_PER_GENUS
    return spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 50 == 0, F.concat(F.lit("Genus"), F.col("id") % 5000)
        )
        .when(F.col("id") % 97 == 0, F.lit("Nonexistent taxon"))
        .otherwise(
            F.concat(
                F.lit("Species"), F.pmod(F.xxhash64("id"), n_species)
            )
        )
        .alias("name"),
        F.when(F.col("id") % 50 == 0, F.lit("GENUS"))
        .otherwise(F.lit("SPECIES"))
        .alias("rank"),
    )


def run(
    spark, rows: int = 2_000_000, keep: bool = False, warmup: bool = True
) -> dict:
    """Build the synthetic snapshot and time the three run_filter
    scenarios. Returns the gbif_pipeline result block (also embedded
    into bench.py's JSON line so the flagship domain pipeline has a
    tracked per-round number, not just the operator queries).

    ``warmup`` runs each scenario once UNTIMED first: the timed pass
    then measures steady-state executor cost — what a long-running
    cluster pays per job — instead of whole-stage-codegen JIT
    compilation, which dominated earlier rounds' numbers and made
    them a function of the block's position in the bench process
    (r5's 6.0 s ran mid-sweep, r6's 7.2 s after 190 queries, a fresh
    JVM pays 12.5 s for identical code — BENCH_GBIF_ISOLATED_r07.json
    pins this). Since r7 the block runs first in bench.py with
    warmup, so the metric is position-independent."""
    workdir = tempfile.mkdtemp(prefix="gbif_bench_")
    timings: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        tax_path = f"{workdir}/taxonomy.parquet"
        occ_path = f"{workdir}/occurrence"
        build_taxonomy(spark).write.mode("overwrite").parquet(tax_path)
        write_occurrence_snapshot(build_occurrence(spark, rows), occ_path)
        timings["build_snapshot"] = round(time.perf_counter() - t0, 3)

        taxonomy = spark.read.parquet(tax_path)
        occurrence = spark.read.parquet(occ_path)
        engine = OccurrenceEngine(taxonomy, occurrence)
        taxa = build_taxa_input(spark).cache()
        taxa.count()

        scenarios = {
            "tag_country": FilterConfig(
                name_column="name", rank_column="rank",
                taxa_kingdom="Animalia", zone=Country("NO")),
            "tag_polygon": FilterConfig(
                name_column="name", rank_column="rank",
                taxa_kingdom="Animalia", zone=Polygon(POLY)),
            "tag_expand": FilterConfig(
                name_column="name", rank_column="rank",
                taxa_kingdom="Animalia", zone=Country("NO"),
                resolve_to_rank="SPECIES"),
        }
        counts = {}
        for name, cfg in scenarios.items():
            if warmup:
                engine.run_filter(taxa, cfg, tag_mode=True).filter(
                    F.col("gbif_filter_tag").eqNullSafe(F.lit(True))
                ).count()
            t0 = time.perf_counter()
            out = engine.run_filter(taxa, cfg, tag_mode=True)
            n_true = out.filter(
                F.col("gbif_filter_tag").eqNullSafe(F.lit(True))
            ).count()
            timings[name] = round(time.perf_counter() - t0, 3)
            counts[name] = n_true

        # VERDICT r3 item 7: quantify the Morton-clustered spatial
        # layout against the taxon-sorted default ON THE PIPELINE
        # QUERY (tests/test_zorder.py quantifies raw row-group
        # pruning; this times tag_polygon end-to-end on both layouts).
        t0 = time.perf_counter()
        zocc_path = f"{workdir}/occurrence_zorder"
        write_spatial_snapshot(spark.read.parquet(occ_path), zocc_path)
        timings["build_zorder_snapshot"] = round(time.perf_counter() - t0, 3)
        zengine = OccurrenceEngine(
            taxonomy, spark.read.parquet(zocc_path)
        )
        if warmup:
            zengine.run_filter(
                taxa, scenarios["tag_polygon"], tag_mode=True
            ).filter(
                F.col("gbif_filter_tag").eqNullSafe(F.lit(True))
            ).count()
        t0 = time.perf_counter()
        zout = zengine.run_filter(
            taxa, scenarios["tag_polygon"], tag_mode=True
        )
        n_true_z = zout.filter(
            F.col("gbif_filter_tag").eqNullSafe(F.lit(True))
        ).count()
        timings["tag_polygon_zorder"] = round(time.perf_counter() - t0, 3)
        assert n_true_z == counts["tag_polygon"], (
            "layout changed query results",
            n_true_z,
            counts["tag_polygon"],
        )
        taxa.unpersist()
        return {
            "metric": "gbif_pipeline",
            # value tracks the three core scenarios only, so the
            # headline number stays comparable across rounds; the
            # zorder-layout timing is reported alongside.
            "value": round(sum(
                timings[k]
                for k in ("tag_country", "tag_polygon", "tag_expand")
            ), 3),
            "unit": "sec",
            "queries": timings,
            "tagged_true": counts,
            "occurrence_rows": rows,
        }
    finally:
        if not keep:
            shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="gbif-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print(json.dumps(run(spark, rows=args.rows, keep=args.keep)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
