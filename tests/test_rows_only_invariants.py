"""Checked invariants for the driver's rows-only (no-oracle) queries
(VERDICT r1 next-step 6): the approximate/LSH operators can't be
hash-compared against DuckDB, but each satisfies a testable relation
to an exact twin — estimate within error bounds, candidates a superset
of the true high-similarity pairs, LSH results a subset of the exact
threshold pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from gbif_filter_python_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)


@pytest.fixture(scope="module")
def sf(sf001_dir):
    return sf001_dir


def test_approx_distinct_within_rsd_of_exact(spark, sf):
    """HLL estimates must land within a few standard errors of the
    exact per-group cardinalities (the q_approx_distinct query asserts
    the same bound as its within_rsd column at sf0.01; this pins the
    raw operator at sf0.001 where the query's floor is unmeasured)."""
    orders = entry_mod._t(spark, sf, "orders")
    rows = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("ap"),
            F.countDistinct("o_custkey").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # 5 sigma at rsd=0.02, floored for tiny groups
        tol = max(5 * 0.02 * r["n"], 3)
        assert abs(r["ap"] - r["n"]) <= tol, (r["o_orderstatus"], r["ap"], r["n"])


def test_approx_percentiles_near_exact(spark, sf):
    """Greenwald-Khanna sketch quantiles must land within a tight
    relative band of the exact interpolated quantiles (accuracy
    10000 >> group sizes here, so the sketch is near-exact; the bound
    is loose enough to survive exact-vs-nearest-rank convention
    differences). Pins the raw aggregates at sf0.001; the
    q_approx_percentiles query asserts the same relation as its
    within_tol column at sf0.01."""
    orders = entry_mod._t(spark, sf, "orders")
    rows = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.25, 0.5, 0.75], 10000
            ).alias("ap"),
            F.expr(
                "percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))"
            ).alias("ex"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for a, v in zip(r["ap"], r["ex"]):
            assert abs(a - v) <= 0.02 * abs(v) + 1.0, (r["o_orderstatus"], a, v)


def test_minhash_candidates_superset_of_high_jaccard_pairs(spark, sf):
    """LSH recall check: every pair with exact shingle-Jaccard >= 0.9
    must appear among the banded MinHash candidates (at 64 hashes /
    16 bands the band threshold is ~0.5; a >=0.9 pair is missed with
    probability ~3e-8, and the hash family is deterministic)."""
    docs = entry_mod._perturbed_docs(spark, sf)
    ids = docs.select("doc_id")
    all_pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    exact_high = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, all_pairs)
        .filter(F.col("jaccard") >= 0.9)
        .collect()
    }
    candidates = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs).collect()
    }
    assert exact_high, "fixture must contain high-Jaccard pairs"
    assert exact_high <= candidates, exact_high - candidates


def test_simhash_candidates_include_exact_duplicates(spark, sf):
    """Exact copies have identical SimHash → hamming 0 → must match in
    every band; all (doc, copy) pairs of the augmented corpus appear."""
    docs = entry_mod._augmented_docs(spark, sf)
    expected = {
        (r["doc_id"], r["doc_id"] + 100000)
        for r in docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 100000)
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_candidates(docs).collect()
    }
    assert expected, "fixture must contain duplicate pairs"
    for pair in expected:
        assert got.get(pair) == 0, (pair, got.get(pair))


def test_exact_cosine_pairs_matches_jvm_form(spark, sf):
    """Differential: the blocked-matmul exact_cosine_pairs (Arrow/NumPy
    path — since r7 also the q_near_dup_exact query body) must produce
    exactly the pair set of the JVM theta-join + HOF cosine
    formulation, built inline here now that the query itself runs on
    the fast path — same 6dp-rounded threshold membership despite
    different summation orders. Also pins the O(n²) refusal guard."""
    from gbif_filter_python_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )
    from gbif_filter_python_spark.operators.similarity import (
        exact_cosine_pairs,
    )

    emb = entry_mod._t(spark, sf, "embeddings")
    fast = {
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(emb, threshold=0.35).collect()
    }
    # the pre-r7 q_near_dup_exact body: hoisted norms, theta-join,
    # interpreted HOF dot — correct but ~30 µs/pair (kept here as the
    # cross-path witness, never as a shipped query)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("_va"),
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("_vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    denom = F.col("_na") * F.col("_nb")
    cos = F.round(
        F.when(
            denom > 0, dot_product(F.col("_va"), F.col("_vb")) / denom
        ).otherwise(F.lit(0.0)),
        6,
    )
    jvm = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(cos >= 0.35)
        .select("id_a", "id_b")
        .collect()
    }
    assert fast == jvm and len(fast) > 0
    with pytest.raises(ValueError, match="max_rows"):
        exact_cosine_pairs(emb, threshold=0.35, max_rows=3)


def test_near_dup_lsh_subset_of_exact_pairs(spark, sf):
    """Bucketed embedding near-dup: exact cosine is verified inside
    buckets, so the LSH pairs are a SUBSET of the exact threshold
    pairs (precision 1.0); recall < 1 by design but non-vacuous.
    (The q_near_dup_lsh query folds this into its subset_ok /
    recall_ok columns at sf0.01; this pins the raw operator.)"""
    from gbif_filter_python_spark.operators.dedup import embedding_near_dups

    emb = entry_mod._t(spark, sf, "embeddings")
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(
            emb, threshold=0.35, n_planes=6
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in entry_mod.q_near_dup_exact(spark, sf).collect()
    }
    assert lsh <= exact, lsh - exact
    assert len(lsh) > 0


def test_ann_lsh_topk_ranks_and_cosine_consistency(spark, sf):
    """LSH ANN output sanity: <= k contiguous ranks per query starting
    at 1, and the reported cosine ordering is correct. (The
    q_ann_lsh_topk query folds the same structural checks into its ok
    column; this pins the raw operator at sf0.001.)"""
    from gbif_filter_python_spark.operators.similarity import lsh_topk

    emb = entry_mod._t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    rows = lsh_topk(emb, queries, k=10, n_planes=4).collect()
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    assert by_query, "ANN query must return rows"
    for qid, rs in by_query.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), (qid, ranks)
        assert len(rs) <= 10
        ordered = sorted(rs, key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in ordered]
        assert cosines == sorted(cosines, reverse=True), (qid, cosines)


def test_semantic_dedup_kept_set_properties(spark, sf):
    """Over the perturbed embeddings (planted near-copies at cosine
    ≈ 0.999): (a) every original survives and every planted copy that
    shares its source's cluster is dropped — keep-lowest-id policy;
    (b) no within-cluster kept pair sits at or above the threshold
    (every dropped row pointed at a lower id, so the minimum of each
    relation chain always survives)."""
    from gbif_filter_python_spark.functions.vectors import cosine_similarity
    from gbif_filter_python_spark.operators.dedup import semantic_dedup

    emb = entry_mod._perturbed_embeddings(spark, sf)
    kept = semantic_dedup(emb, k=4, threshold=0.99, max_iter=4)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    originals = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") < 100000).select("vec_id").collect()
    }
    planted = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") >= 100000).select("vec_id").collect()
    }
    # keep-lowest-id: no original is ever dropped (each pairs only
    # with its higher-id planted copy)
    assert originals <= kept_ids
    # the planted copies are near-identical to their sources, so they
    # share the source's cluster and must be dropped
    assert not (planted & kept_ids), sorted(planted & kept_ids)[:5]
    # no surviving within-cluster pair at/above threshold
    compact = kept.select(
        "cluster", F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
    )
    survivors = (
        compact.alias("l")
        .join(compact.alias("r"), "cluster")
        .filter(F.col("l._id") < F.col("r._id"))
        .filter(cosine_similarity(F.col("l._v"), F.col("r._v")) >= 0.99)
        .count()
    )
    assert survivors == 0


def test_rotation_schedule_covers_every_query():
    """VERDICT r5 item 10: the driver externally witnesses only the
    first DRIVER_WINDOW queries() entries per round; the rotation
    schedule must (a) pin the gbif canary at the head of every round's
    window, (b) put planned_window(CURRENT_ROUND) exactly at the head
    of queries(), and (c) cycle EVERY registry name through some
    round's window within ceil(n/45) rounds — no query can hide from
    external witnessing forever."""
    import math

    reg = list(entry_mod.queries())
    n_rot = len(reg) - len(entry_mod.CANARY)
    # HEAVY_QUOTA slots recycle the expensive lines (VERDICT r9 item
    # 4), so only the remaining general slots bound the full-transit
    # horizon for everything else
    k_general = (
        entry_mod.DRIVER_WINDOW - len(entry_mod.CANARY)
        - entry_mod.HEAVY_QUOTA
    )
    horizon = math.ceil(n_rot / k_general)
    # (a) + (b): current round's plan is the literal head of queries()
    plan = entry_mod.planned_window(entry_mod.CURRENT_ROUND)
    assert plan[: len(entry_mod.CANARY)] == entry_mod.CANARY
    assert reg[: entry_mod.DRIVER_WINDOW] == plan
    # windows are well-formed every round (50 distinct registry names)
    all_names = set(reg)
    for r in range(entry_mod.CURRENT_ROUND, entry_mod.CURRENT_ROUND + horizon):
        w = entry_mod.planned_window(r)
        assert len(w) == entry_mod.DRIVER_WINDOW == len(set(w))
        assert set(w) <= all_names
        assert w[: len(entry_mod.CANARY)] == entry_mod.CANARY
    # (c) full transit within the horizon, from ANY anchor round
    covered = set()
    for r in range(entry_mod.CURRENT_ROUND, entry_mod.CURRENT_ROUND + horizon):
        covered |= set(entry_mod.planned_window(r))
    assert covered == all_names


def test_rotation_front_loads_never_witnessed_names():
    """VERDICT r7 item 6: from round 8 the window is freshness-ordered
    — names the driver has never witnessed (absent from every
    committed CORRECTNESS_r{k}.json) fill the non-canary slots first,
    newest registry insertion first, so this round's additions hit the
    driver oracle THIS round instead of waiting out a blind rotation.
    """
    import math

    latest = entry_mod._witness_rounds(entry_mod.CURRENT_ROUND)
    reg = [n for n in entry_mod._registry() if n not in entry_mod.CANARY]
    fresh = [n for n in reversed(reg) if n not in latest]
    k = entry_mod.DRIVER_WINDOW - len(entry_mod.CANARY)
    window = entry_mod.planned_window(entry_mod.CURRENT_ROUND)
    # the newest min(k, len(fresh)) never-witnessed names are ALL in
    # this round's window, in newest-first order right after the canary
    expect = fresh[: min(k, len(fresh))]
    assert window[len(entry_mod.CANARY):][: len(expect)] == expect
    # and every never-witnessed name transits within ceil(fresh/k)
    rounds_needed = math.ceil(len(fresh) / k) if fresh else 0
    seen = set()
    for r in range(
        entry_mod.CURRENT_ROUND, entry_mod.CURRENT_ROUND + rounds_needed
    ):
        seen |= set(entry_mod.planned_window(r))
    assert set(fresh) <= seen


def test_heavy_lines_rotate_through_driver_window():
    """VERDICT r9 item 4: with 250+ queries and 45 rotating slots, a
    heavy operator could go ~5 rounds without external witness. Every
    HEAVY_QUERIES name must (a) be a real registry query and (b)
    appear in some driver window within len(HEAVY_QUERIES) /
    HEAVY_QUOTA rounds of any anchor round >= the heavy anchor."""
    import math

    reg = set(entry_mod._registry())
    assert set(entry_mod.HEAVY_QUERIES) <= reg
    assert len(set(entry_mod.HEAVY_QUERIES)) == len(entry_mod.HEAVY_QUERIES)
    cycle = math.ceil(
        len(entry_mod.HEAVY_QUERIES) / entry_mod.HEAVY_QUOTA
    )
    start = max(entry_mod.CURRENT_ROUND, entry_mod._HEAVY_ANCHOR)
    for anchor in (start, start + 3):  # any anchor, not just round 10
        covered = set()
        for r in range(anchor, anchor + cycle):
            covered |= set(entry_mod.planned_window(r))
        assert set(entry_mod.HEAVY_QUERIES) <= covered


def test_heavy_recurrence_gap_bounded_over_long_horizon():
    """VERDICT r11 item 7: the cycle-coverage test above proves each
    heavy name appears once per cycle from an anchor; this one pins
    the stronger per-name property the freshness cadence actually
    needs — simulating 3 full cycles of future rounds, the gap
    between CONSECUTIVE driver witnesses of every heavy name stays
    <= ceil(len(HEAVY_QUERIES)/HEAVY_QUOTA) (= 6 today), i.e. the
    most expensive plans are never more than one cycle stale no
    matter how the fresh/stale slots shift between rounds."""
    import math

    reg = set(entry_mod._registry())
    heavy = [n for n in entry_mod.HEAVY_QUERIES if n in reg]
    cycle = math.ceil(len(heavy) / entry_mod.HEAVY_QUOTA)
    start = max(entry_mod.CURRENT_ROUND, entry_mod._HEAVY_ANCHOR)
    horizon = start + 3 * cycle
    last: dict[str, int] = {}
    worst: dict[str, int] = {}
    for r in range(start, horizon + 1):
        win = set(entry_mod.planned_window(r))
        for n in heavy:
            if n in win:
                if n in last:
                    worst[n] = max(worst.get(n, 0), r - last[n])
                last[n] = r
    stale = {
        n: g for n, g in worst.items() if g > cycle
    }
    never_twice = [n for n in heavy if n not in worst]
    assert not stale, (
        f"heavy names exceed the {cycle}-round recurrence bound: "
        f"{stale} — raise HEAVY_QUOTA or split the window by cost tier"
    )
    assert not never_twice, (
        f"heavy names witnessed fewer than twice in {horizon - start} "
        f"simulated rounds: {never_twice}"
    )
