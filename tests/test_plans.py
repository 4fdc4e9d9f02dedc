"""Plan-quality tests — the 100 TB design rules as assertions.

These enforce SURVEY.md §4.3: predicates reach the parquet scan,
small sides broadcast, existence probes don't shuffle the fact, and
nothing goes cartesian by accident.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from gbif_filter_python_spark.plans.inspect import (
    codegen_stage_count,
    explain_str,
    has_broadcast_join,
    pushed_filters,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/orders.parquet")


def test_filter_pushdown_reaches_scan(lineitem):
    df = lineitem.filter(F.col("l_quantity") > 30).select("l_orderkey")
    pushed = pushed_filters(df)
    assert any("l_quantity" in p for p in pushed), pushed


def test_column_pruning_reaches_scan(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    text = explain_str(df, "formatted")
    # The scan must read only the projected columns.
    assert "ReadSchema" in text
    read_schema = [l for l in text.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_existence_probe_broadcasts(spark, orders, sf001_dir):
    """The engine's signature move: distinct probe keys broadcast, the
    fact side never shuffles (SURVEY.md §4.3)."""
    customer = spark.read.parquet(f"{sf001_dir}/customer.parquet")
    keys = orders.select("o_custkey").distinct()
    df = customer.join(
        F.broadcast(keys), customer["c_custkey"] == keys["o_custkey"], "left_semi"
    )
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # no exchange on the customer (streamed) side other than broadcast
    assert plan.count("Exchange") <= 2


def test_run_filter_pipeline_broadcasts(spark, sf001_dir):
    from gbif_filter_python_spark import Country, FilterConfig, OccurrenceEngine
    from gbif_filter_python_spark.schemas import OCCURRENCE_SCHEMA, TAXONOMY_SCHEMA

    taxonomy = spark.createDataFrame([], TAXONOMY_SCHEMA)
    occurrence = spark.createDataFrame([], OCCURRENCE_SCHEMA)
    taxa = spark.createDataFrame([("Abc",)], "name string")
    cfg = FilterConfig(name_column="name", zone=Country("NO"))
    out = OccurrenceEngine(taxonomy, occurrence).run_filter(taxa, cfg)
    assert has_broadcast_join(out)


def test_no_forced_broadcast_on_cardinality_scaling_sides(taxonomy, occurrence):
    """Sides that scale with the caller's input (expansion frontier,
    expansion arrays, get_occurrences key set) must carry NO forced
    broadcast hint — AQE picks broadcast at runtime when a side is
    actually small, and a forced hint would cap the engine at the 8 GB
    broadcast limit on family-scale inputs (VERDICT r1 #3)."""
    from gbif_filter_python_spark import OccurrenceEngine
    from gbif_filter_python_spark.operators.expansion import descend_to_rank
    from gbif_filter_python_spark.plans.inspect import broadcast_hint_count

    parents = taxonomy.select(F.col("key").alias("parent"))
    descended = descend_to_rank(taxonomy, parents, "SPECIES")
    assert broadcast_hint_count(descended) == 0

    engine = OccurrenceEngine(taxonomy, occurrence)
    occ = engine.get_occurrences(taxonomy.select(F.col("key").alias("gbif_key")))
    assert broadcast_hint_count(occ) == 0


def test_bucketed_join_is_shuffle_free(spark, sf001_dir):
    """Co-located join: two tables bucketed on the join key with the
    same bucket count must sort-merge-join with ZERO Exchange — the
    100 TB pre-bucketing play (sources/io.py::write_bucketed_table)."""
    from gbif_filter_python_spark.sources.io import write_bucketed_table

    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", num_buckets=4, sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        lineitem.select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", num_buckets=4, sort_cols=["l_orderkey"],
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        df = a.join(b, a["o_orderkey"] == b["l_orderkey"])
        plan = explain_str(df, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert df.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_agg_has_map_side_combine(lineitem):
    """Aggregation must be partial+final (map-side combine): at 100 TB
    the shuffle carries one row per (partition, group), not the fact.

    Note: with AQE the pre-execution plan shows HashAggregate pairs but
    no WholeStageCodegen markers (those appear in the final plan), so
    assert on partial_sum."""
    df = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = explain_str(df, "simple")
    assert "partial_sum" in plan, plan


def test_codegen_present_after_execution(lineitem):
    df = lineitem.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    df.count()  # materialize so AQE finalizes the plan
    assert codegen_stage_count(df) >= 1 or "HashAggregate" in explain_str(
        df, "simple"
    )


def test_partitioned_snapshot_prunes_country(spark, occurrence, tmp_path):
    """Zone predicate must partition-prune the snapshot layout
    (SURVEY.md §4.3: fact partitioned by country)."""
    from gbif_filter_python_spark.sources.io import (
        read_occurrence_snapshot,
        write_occurrence_snapshot,
    )

    path = str(tmp_path / "occ_snapshot")
    write_occurrence_snapshot(occurrence, path)
    snap = read_occurrence_snapshot(spark, path)
    df = snap.filter(F.col("country") == "NO").select("taxon_key")
    text = explain_str(df, "formatted")
    # the country predicate must appear as a PartitionFilter, not a
    # post-scan filter
    assert "PartitionFilters" in text
    pf_line = [l for l in text.splitlines() if "PartitionFilters" in l][0]
    assert "country" in pf_line
    assert df.count() == 7  # NO rows in the fixture


def test_corpus_prep_plan_shape(spark, sf001_dir):
    """The corpus pipeline's plan follows the scale rules: no
    cartesian join (the 1-row percentile bounds ride a broadcast
    nested loop, which is the intended shape), the documents scan
    reads only the referenced columns, and dedup/packing aggregate
    with partial combine where applicable."""
    from gbif_filter_python_spark.operators.corpus import (
        prepare_training_corpus,
    )
    from gbif_filter_python_spark.plans.inspect import assert_no_cartesian

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = prepare_training_corpus(docs)
    assert_no_cartesian(out)


def test_contamination_no_cartesian_and_pruned_scan(spark, sf001_dir):
    from gbif_filter_python_spark.operators.corpus import (
        contamination_report,
    )
    from gbif_filter_python_spark.plans.inspect import assert_no_cartesian

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    rep = contamination_report(docs)
    assert_no_cartesian(rep)
    # Only doc_id and text feed the report; lang/source/n_chars must
    # not be read from the parquet scan.
    plan = explain_str(rep, "formatted")
    assert "ReadSchema" in plan
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert all("n_chars" not in line for line in read_schemas), read_schemas


def test_tfidf_partial_aggregation(spark, sf001_dir):
    from gbif_filter_python_spark.operators.corpus import tfidf_top_terms

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = explain_str(tfidf_top_terms(docs), "simple")
    assert "partial_count" in plan, plan


def test_mixture_sample_filter_is_map_only(spark, sf001_dir):
    """After the (driver-collected) totals aggregation, the kept-set
    filter must be a map-only projection over the scan — thresholds
    are literals folded into one when-chain, so the corpus never
    shuffles (no Exchange anywhere in the sampled plan)."""
    from gbif_filter_python_spark.operators.corpus import mixture_sample

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    kept = mixture_sample(
        docs, {"en": 5, "de": 2}, "lang", "doc_id"
    )
    plan = explain_str(kept, "simple")
    assert "Exchange" not in plan, plan


def test_bpe_pair_count_has_partial_aggregation(spark, sf001_dir):
    """One trainer iteration's pair count must partial-aggregate
    map-side: the shuffle carries (pair, count) partials, never the
    exploded pair stream."""
    from gbif_filter_python_spark.operators.bpe import _distinct_words

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = explain_str(_distinct_words(docs, "text"), "simple")
    assert "partial_count" in plan, plan


def test_bloom_prefilter_prunes_before_fact_exchange(spark, sf001_dir):
    """The Bloom probe must sit BELOW the fact's shuffle: a broadcast
    nested-loop join against the 1-row filter feeds the equi-join, so
    pruned rows never ride the exchange."""
    from gbif_filter_python_spark.operators.skew import bloom_prefilter_join

    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet").filter(
        "o_orderstatus = 'P'"
    ).select("o_orderkey")
    plan = explain_str(
        bloom_prefilter_join(li, orders, "l_orderkey", "o_orderkey",
                             expected_items=10_000),
        "simple",
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the probe's nested-loop join appears deeper in the tree (later in
    # the printed plan) than the final equi-join of the fact
    probe_at = plan.index("BroadcastNestedLoopJoin")
    equi_at = min(
        (plan.index(j) for j in ("SortMergeJoin", "BroadcastHashJoin",
                                 "ShuffledHashJoin") if j in plan),
        default=None,
    )
    assert equi_at is not None and equi_at < probe_at, plan


def test_star_join_broadcasts_all_dims(spark, sf001_dir):
    """TPC-H Q5 shape: every dimension side must broadcast (no
    sort-merge join at this scale ratio) and the order-date slice must
    push down to the parquet scan."""
    import __spark_entry__ as entry_mod

    df = entry_mod.q_star_join_revenue(spark, sf001_dir)
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    scans = [l for l in plan.splitlines() if "FileScan" in l and "orders" in l]
    assert scans and any("o_orderdate" in l and "PushedFilters" in l for l in scans)


def test_dynamic_partition_pruning_on_snapshot(spark, occurrence, tmp_path):
    """At 100 TB the zone is often known only through a DIMENSION
    filter, not a literal — dynamic partition pruning must inject the
    dim-side subquery into the fact scan's PartitionFilters so
    non-qualifying country directories are never read."""
    from gbif_filter_python_spark.sources.io import (
        read_occurrence_snapshot,
        write_occurrence_snapshot,
    )

    path = str(tmp_path / "occ_dpp")
    write_occurrence_snapshot(occurrence, path)
    snap = read_occurrence_snapshot(spark, path)
    zones = spark.createDataFrame(
        [("NO", "nordic"), ("FR", "continental"), ("BR", "tropics")],
        "country string, zone_class string",
    )
    joined = snap.join(
        F.broadcast(zones.filter(F.col("zone_class") == "nordic")),
        "country",
    ).select("taxon_key")
    text = explain_str(joined, "formatted")
    assert "dynamicpruning" in text.lower(), text
    assert joined.count() == 7  # the NO partition only


def test_polygon_bbox_conjuncts_push_to_snapshot_scan(
    spark, occurrence, tmp_path
):
    """VERDICT r3 item 7: the polygon predicate's bbox prefilter must
    reach the parquet scan as PushedFilters on decimal_lon/decimal_lat
    (all four range conjuncts), so at 100 TB the row-group min/max
    stats prune BEFORE the ray-cast pandas UDF ever sees a row — the
    UDF runs only on bbox survivors."""
    from gbif_filter_python_spark.config import Polygon
    from gbif_filter_python_spark.operators.spatial import polygon_filter
    from tests.conftest import NORWAY_ISH_WKT

    path = str(tmp_path / "occ_poly_snapshot")
    occurrence.write.parquet(path)
    snap = spark.read.parquet(path)
    out = polygon_filter(snap, Polygon(NORWAY_ISH_WKT))
    pushed = pushed_filters(out)
    for col in ("decimal_lon", "decimal_lat"):
        assert any(
            col in p and "GreaterThanOrEqual" in p for p in pushed
        ), (col, pushed)
        assert any(
            col in p and "LessThanOrEqual" in p for p in pushed
        ), (col, pushed)
    # and the exact ray-cast still applies above the scan: result is
    # the true polygon membership, not just the bbox
    assert out.count() == occurrence.filter(
        F.col("decimal_lon").between(5.0, 12.0)
        & F.col("decimal_lat").between(58.0, 62.0)
    ).count()


def test_nb_scoring_broadcasts_model_corpus_never_wide_shuffles(
    spark, sf001_dir
):
    """classify.nb_score: the dense bounded model must broadcast; the
    corpus token stream's only exchange is the partial-aggregated
    (doc, label) sum — no sort-merge join anywhere."""
    from gbif_filter_python_spark.operators.classify import (
        nb_score,
        nb_train,
    )

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    model = nb_train(docs, num_buckets=64)
    scored = nb_score(docs, model, num_buckets=64)
    plan = explain_str(scored, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_fingerprints_before_the_join(spark, sf001_dir):
    """scd.snapshot_diff: the xxhash64 fingerprint must be computed in
    a projection BELOW the single join (wide columns never cross the
    shuffle), and the join must be the only one in the plan."""
    from gbif_filter_python_spark.operators.scd import snapshot_diff

    cust = spark.read.parquet(f"{sf001_dir}/customer.parquet")
    old = cust.select("c_custkey", "c_name", "c_mktsegment")
    new = cust.select(
        "c_custkey", "c_name", F.upper("c_mktsegment").alias("c_mktsegment")
    )
    diff = snapshot_diff(old, new, ["c_custkey"])
    plan = explain_str(diff, "simple")
    # exactly one join operator of any kind ("simple" mode: each
    # physical operator appears once, unlike "formatted"'s tree+details)
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1, plan
    plan = explain_str(diff, "formatted")
    # the shuffle carries only key + fingerprint (+ presence flag):
    # no c_name / c_mktsegment above the scan projections
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for ex in exchanges:
        assert "c_name" not in ex and "c_mktsegment" not in ex


def test_phash_near_dup_shuffle_excludes_pixels(spark):
    """phash_near_dups: the band join must move (band, hash, id, sig)
    rows only — pixel arrays must not appear in any exchange."""
    import numpy as np

    from gbif_filter_python_spark.multimodal.binary_ops import (
        dhash_images,
        phash_near_dups,
    )

    rng = np.random.default_rng(1)
    rows = [
        (i, [float(x) for x in rng.random(64)], 8, 8) for i in range(4)
    ]
    decoded = spark.createDataFrame(
        rows, "media_id long, pixels array<float>, width int, height int"
    )
    pairs = phash_near_dups(dhash_images(decoded))
    plan = explain_str(pairs, "formatted")
    import re

    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "pixels" not in ex, ex


def test_pq_adc_scoring_is_single_scan_no_shuffle_before_topk(
    spark, sf001_dir
):
    """pq_topk: scoring the compressed index is map-only (UDF + scalar
    math); the first exchange in the plan is the per-query top-k
    window partitioning, nothing before it."""
    from gbif_filter_python_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    books, _ = pq_train(emb, m=8, ksub=16, max_iter=1)
    enc = pq_encode(emb, books).localCheckpoint(eager=True)
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    res = pq_topk(enc, q, books, k=5)
    plan = explain_str(res, "simple")
    # exactly one hash-partitioning exchange: the window's query_id one
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan  # queries side is broadcast


def test_merge_intervals_single_exchange(spark, sf001_dir):
    """Coverage merge is one key shuffle + one sort: the running-max,
    flag-cumsum, and final aggregation all reuse the same
    (key)-partitioning — a second Exchange would mean the window
    chain broke partitioning reuse."""
    from gbif_filter_python_spark.operators.temporal import (
        merge_intervals,
    )

    ev = spark.read.parquet(f"{sf001_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("start"),
        (F.col("o_orderkey") + 5).alias("end"),
    )
    plan = explain_str(
        merge_intervals(ev, "k", "start", "end"), mode="simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_bm25_broadcasts_query_terms_not_corpus(spark, sf001_dir):
    """The query-term and df tables broadcast onto the corpus tf
    table; the corpus side must NOT be the broadcast side (it is the
    100 TB side)."""
    from gbif_filter_python_spark.operators.ranking import bm25_top_docs

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    probes = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    plan = explain_str(bm25_top_docs(docs, probes, k=10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_cusum_windows_share_one_sort(spark, sf001_dir):
    """The three staged window projections (baseline avg, cumsum,
    running min) must share one Exchange+Sort on the key — the
    closed-form CUSUM's whole cost claim."""
    from gbif_filter_python_spark.operators.temporal import (
        cusum_changepoints,
    )

    ev = spark.read.parquet(f"{sf001_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = cusum_changepoints(
        ev, "user_id", "event_id", "value", slack=1.0, threshold=5.0
    )
    plan = explain_str(out, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1


def test_association_rules_apriori_prune_broadcasts(spark, sf001_dir):
    """The frequent-item filter joins the (basket, item) stream via
    broadcast (the frequent set is bounded by the catalog), and no
    cartesian sneaks in besides the 1-row n_baskets scalar."""
    from gbif_filter_python_spark.operators.analytics import (
        association_rules,
    )

    ev = spark.read.parquet(f"{sf001_dir}/events.parquet").select(
        "user_id",
        (F.get_json_object("props", "$.k").cast("int") % 50).alias("item"),
    )
    plan = explain_str(
        association_rules(ev, "user_id", "item", min_support=0.5)
    )
    assert "BroadcastHashJoin" in plan


def test_sorted_neighborhood_rank_join_carries_integers(spark, sf001_dir):
    """The neighbor join keys on the integer rank — the sort key
    (potentially the whole normalized text) must not appear in the
    join output columns that shuffle."""
    from gbif_filter_python_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )
    from gbif_filter_python_spark.functions.text import normalized_text

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet").select(
        "doc_id", normalized_text(F.col("text")).alias("_key")
    )
    out = sorted_neighborhood_pairs(docs, ["_key"], window=3)
    plan = explain_str(out)
    # the final join is an equi-join on _sn_rank
    assert "_sn_rank" in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_q21_shape_broadcasts_dim_and_reuses_fact_scan(spark, sf001_dir):
    """sole_blame_supplier: the supplier dim must broadcast; the
    semi/anti probes must not go cartesian; and the plan must contain
    no more than the three lineitem scans the query declares (l1, the
    EXISTS probe, the NOT EXISTS probe) — a regression that expands
    correlated probes into per-row subplans would blow this up."""
    import __spark_entry__ as entry_mod

    df = entry_mod.q_sole_blame_supplier(spark, sf001_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    n_li_scans = sum(
        1 for l in plan.splitlines() if "FileScan" in l and "lineitem" in l
    )
    assert 1 <= n_li_scans <= 3, plan


def test_weighted_median_single_exchange(spark, sf001_dir):
    """weighted_median: the window and both aggregates share the
    group key, so the whole query needs exactly ONE shuffle of the
    fact (plus AQE reads) — a second Exchange means the agg stopped
    reusing the window's partitioning."""
    from gbif_filter_python_spark.operators.profile import weighted_median

    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    df = weighted_median(li, ["l_returnflag"], "l_extendedprice", "l_quantity")
    plan = explain_str(df, "simple")
    assert plan.count("Exchange") <= 2, plan  # 1 hash + optional final


def test_fd_candidates_one_shuffle_per_lhs(spark, sf001_dir):
    """fd_candidates: all rhs distinct-counts for one lhs share a
    single groupBy — the plan for a 2-rhs candidate set on one lhs
    must contain one Expand (the documented multi-distinct cost) and
    scan orders exactly once."""
    from gbif_filter_python_spark.operators.profile import fd_candidates

    o = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    df = fd_candidates(o, {"o_custkey": ["o_orderstatus", "o_orderpriority"]})
    plan = explain_str(df, "simple")
    n_scans = sum(
        1 for l in plan.splitlines() if "FileScan" in l and "orders" in l
    )
    assert n_scans == 1, plan
    assert plan.count("Expand") == 1, plan


def test_skyline_local_prune_runs_before_any_exchange(spark, sf001_dir):
    """skyline phase 1 must be map-side: the local prune runs (and is
    materialized by the candidate-funnel's localCheckpoint) BEFORE the
    single-partition Coalesce of the global pass. Since r5 the funnel
    checkpoints the pruned candidates, so the final plan shows ONE
    MapInPandas (the global exact pass) sitting above Coalesce(1)
    above the checkpointed candidate scan — the fact itself never
    reaches the single partition. The local prune's map-side-ness is
    additionally pinned semantically: the checkpointed candidate
    count is far below the fact row count."""
    from gbif_filter_python_spark.operators.analytics import skyline

    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    pts = li.select("l_orderkey", "l_quantity", "l_extendedprice")
    df = skyline(pts, {"l_quantity": "max", "l_extendedprice": "min"})
    plan = explain_str(df, "simple")
    assert plan.count("MapInPandas") == 1, plan
    coal = plan.index("Coalesce")
    # top-down print: global MapInPandas first, then Coalesce, then
    # the checkpointed (already-pruned) candidate scan — never a
    # parquet scan below the Coalesce.
    assert plan.index("MapInPandas") < coal, plan
    ckpt = plan.index("Scan ExistingRDD")
    assert coal < ckpt, plan
    assert "parquet" not in plan[coal:].lower(), plan


def test_rank_stats_never_globally_sort_the_fact(spark, sf001_dir):
    """rank_sum_test / spearman_corr build ranks from DISTINCT-VALUE
    aggregates: the plan's unpartitioned window (the only global
    Sort) must consume the |distinct|-row aggregate, never the fact —
    i.e. every Sort sits ABOVE an Aggregate in the tree, so the scan
    feeds an aggregation, not a sort."""
    from gbif_filter_python_spark.operators.profile import (
        rank_sum_test,
        spearman_corr,
    )

    ev = spark.read.parquet(f"{sf001_dir}/orders.parquet").select(
        F.col("o_orderstatus").alias("g"),
        F.col("o_totalprice").alias("v"),
    )
    for df in (
        rank_sum_test(ev, "g", "v", "O", "F"),
        spearman_corr(ev.select(F.col("v").alias("x"),
                                (F.col("v") % 97).alias("y")), "x", "y"),
    ):
        plan = explain_str(df, "simple")
        lines = plan.splitlines()
        # walk each Sort node: everything printed below it at deeper
        # indentation until the indent pops back is its subtree — a
        # HashAggregate must appear in there before any scan leaf,
        # otherwise the Sort is consuming raw fact rows. A
        # ReusedExchange in the subtree points at an exchange printed
        # in a SIBLING branch (which branch gets the Reused node is
        # planner-order dependent): resolve its plan_id back to the
        # original Exchange and require the aggregate below THAT.
        def indent(l):
            return len(l) - len(l.lstrip(" +-:"))

        def subtree_of(i):
            base = indent(lines[i])
            out = []
            for nxt in lines[i + 1:]:
                if nxt.strip() and indent(nxt) <= base:
                    break
                out.append(nxt)
            return "\n".join(out)

        def feeds_aggregate(i, seen=()):
            sub = subtree_of(i)
            if "HashAggregate" in sub:
                return True
            m = re.search(r"ReusedExchange \[[^\]]*\], Exchange .*?\[plan_id=(\d+)\]", sub)
            if not m or m.group(1) in seen:
                return False
            pid = m.group(1)
            for j, l2 in enumerate(lines):
                if (
                    f"[plan_id={pid}]" in l2
                    and "Exchange" in l2
                    and "ReusedExchange" not in l2
                ):
                    return "HashAggregate" in subtree_of(j) or feeds_aggregate(
                        j, (*seen, pid)
                    )
            return False

        for i, l in enumerate(lines):
            if " Sort " not in f" {l.strip()} ":
                continue
            assert feeds_aggregate(i), (
                "Sort consumes unaggregated input:\n" + plan
            )


def test_mlm_mask_hashes_each_position_once(spark):
    """ADVICE r5: Catalyst does no CSE inside higher-order-function
    lambdas, so mlm_mask's per-position mask decision must be staged
    into its own projection and referenced, not recomputed — exactly
    ONE md5 in the physical plan (the old two-consumer form had 2,
    doubling the dominant map-side cost)."""
    from gbif_filter_python_spark.operators.corpus import mlm_mask

    df = spark.createDataFrame(
        [(1, "some words here")], "doc_id long, text string"
    )
    plan = explain_str(mlm_mask(df), "simple")
    assert plan.count("md5") == 1


def test_zipf_top_k_is_merge_not_global_sort(spark, sf001_dir):
    """zipf_fit's vocabulary head must come from a per-partition
    top-k merge (TakeOrderedAndProject), never a full vocabulary
    Sort+Exchange — the difference between O(k) and O(|vocab|)
    driver-side state at 100 TB."""
    from gbif_filter_python_spark.operators.corpus import zipf_fit

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    plan = explain_str(zipf_fit(docs, top_k=100), "simple")
    assert "TakeOrderedAndProject" in plan


def test_target_encode_grid_joins_broadcast(spark):
    """target_encode's roll-ups and join-back must broadcast (the
    grid is |cats x folds| — bounded model state); the fact shuffles
    once for the grid aggregation and never again."""
    from gbif_filter_python_spark.operators.classify import target_encode

    df = spark.createDataFrame(
        [(i, "c" + str(i % 3), float(i % 7)) for i in range(50)],
        "key long, cat string, y double",
    )
    plan = explain_str(target_encode(df, "cat", "y", "key"), "simple")
    assert has_broadcast_join(target_encode(df, "cat", "y", "key"))
    # no sort-merge join anywhere in the encode plan
    assert "SortMergeJoin" not in plan


def test_calibration_bins_single_scan_single_agg(spark):
    """calibration_bins: one hash aggregation with map-side partial
    combine, total from a window over the <=B aggregate rows — the
    fact appears EXACTLY ONCE in the plan (the agg+crossJoin
    formulation scanned it twice) and no join exists at all."""
    from gbif_filter_python_spark.operators.classify import (
        calibration_bins,
    )

    df = spark.createDataFrame(
        [(0.1 * i % 1.0, i % 2) for i in range(20)],
        "score double, label int",
    )
    out = calibration_bins(df, "score", "label", 10)
    plan = explain_str(out, "simple")
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan


def test_psm_att_is_windowed_never_nested_loop(spark):
    """psm_att: the nearest-control match is the sorted-neighborhood
    trick — a range shuffle + two linear per-partition window passes
    with a broadcast boundary carry (round 13; the single-partition
    global window died with the rewrite). The plan must contain
    Window operators and NO nested-loop/cartesian join anywhere (the
    naive NN formulation is a theta-join)."""
    from gbif_filter_python_spark.operators.analytics import psm_att

    df = spark.createDataFrame(
        [(i % 2, float(i), float(i * 2), i) for i in range(40)],
        "t int, s double, y double, id long",
    )
    plan = explain_str(psm_att(df, "t", "s", "y", "id"), "simple")
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    # allowed joins: the BROADCAST carry join of the per-partition
    # boundary structs (bounded by the partition count) and the final
    # 1-row x 1-row scalar crossJoin of the two aggregates (plans as
    # a broadcast nested loop over singleton rows — harmless); the
    # MATCH path itself must never join the unit table to itself
    assert plan.count("Join") == 2
    assert plan.count("BroadcastHashJoin") == 1


def test_referential_integrity_broadcasts_dims(spark, sf001_dir):
    """referential_integrity: every dim reduces to distinct keys and
    broadcast-joins the fact — no shuffle (SortMergeJoin/Exchange
    hash) of the fact side for the join itself."""
    from gbif_filter_python_spark.operators.profile import (
        referential_integrity,
    )

    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf001_dir}/customer.parquet")
    out = referential_integrity(
        [("c", orders, "o_custkey", customer, "c_custkey")]
    )
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anova_f_single_fact_scan_one_agg(spark, sf001_dir):
    """anova_f: the fact is scanned once into ONE partial-combined
    hash aggregation; the k-row summary handles everything after."""
    from gbif_filter_python_spark.operators.profile import anova_f

    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    plan = explain_str(
        anova_f(orders, "o_orderpriority", "o_totalprice"), "simple"
    )
    assert plan.count("orders.parquet") == 1
    assert "partial_count" in plan or "partial_avg" in plan


def test_pca_project_row_path_is_pure_column(spark):
    """pca_project: the per-row projection is zip_with + aggregate
    against a literal array — NO Python evaluation (BatchEvalPython /
    ArrowEvalPython / mapInPandas) may appear in the SCORING plan.
    (The component itself comes from the covariance pass, which is
    the documented mapInPandas partial-Gram — that part runs before
    and collapses to driver state.)"""
    from gbif_filter_python_spark.operators.linalg import pca_project

    import numpy as np

    rng = np.random.default_rng(0)
    rows = [
        (i, [float(v) for v in rng.normal(size=4)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pca_project(df, dim=4, n_iter=2)
    plan = explain_str(out, "simple")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # zip_with/aggregate fold present as catalyst expressions
    assert "zip_with" in plan.lower() or "aggregate" in plan.lower()


def test_vocab_overlap_shared_join_is_term_keyed(spark):
    """vocab_overlap: the intersection join must be keyed on the term
    (equi-join), never an all-pairs vocabulary comparison — assert an
    equi-join exists and no cartesian/BNLJ appears; the size lookups
    are broadcast."""
    from gbif_filter_python_spark.operators.corpus import vocab_overlap

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "y z w"), ("c", "k")],
        "source string, text string",
    )
    plan = explain_str(vocab_overlap(df, "source"), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the two size dims
