"""Canonical schemas for the engine's two core tables and helpers.

The reference accesses GBIF REST response fields by key with no
validation (matchType/synonym/usageKey at
/root/reference/gbif_helper.py:20-25; taxonomicStatus/canonicalName/key
at gbif_helper.py:49; taxonKey/taxonRank/count at gbif_helper.py:92-105).
Those accesses define the minimum schemas of the materialized
``taxonomy`` dimension and ``occurrence`` fact (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: GBIF Backbone dataset key constant (/root/reference/gbif_helper.py:38)
BACKBONE_DATASET_KEY = "d7dddbf4-2cf0-4f39-9b2a-bb099caae36c"

#: Taxonomy dimension (~7M rows at full GBIF scale — broadcastable when
#: filtered, sort-merge join otherwise; AQE decides).
TAXONOMY_SCHEMA = StructType(
    [
        StructField("key", LongType(), nullable=False),
        StructField("parent_key", LongType(), nullable=True),
        StructField("canonical_name", StringType(), nullable=True),
        StructField("rank", StringType(), nullable=True),
        StructField("kingdom", StringType(), nullable=True),
        StructField("taxonomic_status", StringType(), nullable=True),
        StructField("is_synonym", BooleanType(), nullable=True),
        StructField("accepted_key", LongType(), nullable=True),
        StructField("habitat", StringType(), nullable=True),
        StructField("dataset_key", StringType(), nullable=True),
    ]
)

#: Occurrence fact (the 100 TB-scale table). At cluster scale this is
#: partitioned by ``country`` (partition-prunes the country predicate,
#: SURVEY.md §2 op 16) and bucketed by ``taxon_key`` (co-locates the
#: existence semi-join probe side).
OCCURRENCE_SCHEMA = StructType(
    [
        StructField("occurrence_id", LongType(), nullable=False),
        StructField("taxon_key", LongType(), nullable=True),
        StructField("taxon_rank", StringType(), nullable=True),
        StructField("country", StringType(), nullable=True),
        StructField("decimal_lon", DoubleType(), nullable=True),
        StructField("decimal_lat", DoubleType(), nullable=True),
        StructField("event_ts", TimestampType(), nullable=True),
    ]
)

#: Species-interaction edge table (legacy ``InteractionSource.
#: get_interactions``, /root/reference/util/__pycache__/
#: data_source.cpython-37.pyc, SURVEY.md §1.4) re-expressed as a
#: set-oriented edge list: one row per (source taxon, target taxon,
#: interaction type) — the GloBI-style shape an ecology pipeline
#: materializes. At scale this is a fact table keyed by
#: source_taxon_key; existence probes and expansions reuse the same
#: broadcast-distinct-keys shape as occurrences.
INTERACTION_SCHEMA = StructType(
    [
        StructField("source_taxon_key", LongType(), nullable=False),
        StructField("target_taxon_key", LongType(), nullable=False),
        StructField("interaction_type_id", LongType(), nullable=False),
    ]
)

#: Interaction-type dimension backing the legacy
#: ``resolve_interaction_name``: canonical name + synonyms per type id
#: (tiny — always broadcast).
INTERACTION_NAME_SCHEMA = StructType(
    [
        StructField("interaction_type_id", LongType(), nullable=False),
        StructField("interaction_name", StringType(), nullable=False),
        StructField("is_synonym", BooleanType(), nullable=False),
    ]
)

#: Valid taxonomic ranks, from the config validation enum
#: (/root/reference/apply_gbif_filter.py:58-70).
RANKS = ("KINGDOM", "PHYLUM", "CLASS", "ORDER", "FAMILY", "GENUS", "SPECIES")

#: Habitat enum (/root/reference/apply_gbif_filter.py:66-70).
HABITATS = ("TERRESTRIAL", "FRESHWATER", "MARINE")

#: Statuses observed at /root/reference/gbif_helper.py:49.
STATUS_ACCEPTED = "ACCEPTED"
