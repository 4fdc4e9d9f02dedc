"""Explicit assertions for the measured dataset-specific facts the
cross-engine oracles rely on (ADVICE r3, __spark_entry__ oracle
hardening). Several full hash-match oracles are only valid because of
a property measured on THIS corpus:

* ``minhash_pairs`` / ``minhash_dedup`` / ``leakage_split`` — MinHash
  banding (64 hashes / 16 bands) recalls 100% of exact shingle-Jaccard
  >= 0.8 pairs, so verified-candidates == the exact pair set.
* ``rollup_merge`` — per-month user_id cardinality is low enough that
  the HLL sketch operates in exact mode (estimate == exact count).
* ``approx_top_terms`` — no count tie at the rank-20 boundary, so the
  exact top-20 is a unique set.

The failure direction of those oracles is safe (false alarm, never a
false pass), but a testdata refresh would surface only as a bare hash
mismatch. These tests assert the preconditions directly at sf0.01 —
the driver gate's scale — so a data change reports WHICH assumption
broke, by name, before anyone has to bisect a hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from gbif_filter_python_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def sf(sf01_dir):
    # Gate scale: the driver compares Spark vs DuckDB at sf0.01, so the
    # preconditions must hold exactly here (not just at sf0.001).
    return sf01_dir


def test_minhash_banding_recall_is_exactly_one_at_gate_threshold(spark, sf):
    """PRECONDITION for the minhash_pairs / minhash_dedup /
    leakage_split oracles: the banded candidate set must contain EVERY
    pair with exact 5-shingle Jaccard >= 0.8 (recall exactly 1.0).
    If this fails after a testdata refresh, those three oracles are no
    longer valid as full hash-matches — re-measure before trusting
    their CORRECTNESS rows."""
    docs = entry_mod._perturbed_docs(spark, sf)
    ids = docs.select("doc_id")
    all_pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, all_pairs)
        .filter(F.col("jaccard") >= 0.8)
        .collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs).collect()
    }
    assert exact, "corpus must contain exact J>=0.8 pairs (fixture vacuous)"
    missed = exact - cands
    assert not missed, (
        "MinHash banding recall < 1.0 at J>=0.8 on this corpus: "
        f"{len(missed)}/{len(exact)} exact pairs missed "
        f"(e.g. {sorted(missed)[:5]}). The minhash_pairs, minhash_dedup "
        "and leakage_split oracles assume recall == 1.0 and are now "
        "invalid as full hash-matches."
    )


def test_rollup_hll_is_in_exact_mode_at_monthly_cardinality(spark, sf):
    """PRECONDITION for the rollup_merge oracle: HLL distinct-user
    estimates per month must equal the exact counts (the sketch stays
    in exact mode at this cardinality). If a testdata refresh raises
    per-month cardinality past the exact-mode boundary, rollup_merge's
    est_distinct column stops hash-matching DuckDB's exact count."""
    rows = entry_mod.q_rollup_merge(spark, sf).collect()
    ev = entry_mod._t(spark, sf, "events").withColumn(
        "month", F.date_format(F.to_date("ts"), "yyyy-MM")
    )
    exact = {
        r["month"]: r["n"]
        for r in ev.groupBy("month")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert rows and exact
    for r in rows:
        assert r["est_distinct"] == exact[r["month"]], (
            f"HLL left exact mode for month {r['month']}: estimate "
            f"{r['est_distinct']} != exact {exact[r['month']]}. The "
            "rollup_merge oracle assumes 0 HLL error and is now invalid."
        )


def test_approx_top_terms_has_no_tie_at_rank_boundary(spark, sf):
    """PRECONDITION for the approx_top_terms oracle: the exact word
    counts at rank 20 and rank 21 must differ, otherwise 'the top-20'
    is not a unique set and the Spark-vs-DuckDB hash comparison is
    comparing two equally-valid answers."""
    from gbif_filter_python_spark.operators.dedup import words_array

    docs = entry_mod._t(spark, sf, "documents")
    counts = (
        docs.select(F.explode(words_array(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), "w")
        .limit(25)
        .collect()
    )
    assert len(counts) >= 21, "corpus has fewer than 21 distinct words"
    c20, c21 = counts[19]["count"], counts[20]["count"]
    assert c20 > c21, (
        f"count tie at the rank-20 boundary ({c20} == {c21}): the "
        "approx_top_terms top-20 set is not unique and its oracle is "
        "no longer a valid hash-match."
    )


def test_kmeans_runs_all_five_iterations_no_early_stop(spark, sf):
    """PRECONDITION for the kmeans_clusters oracle: _kmeans_oracle
    unrolls exactly 5 Lloyd iterations, so the Spark fit must not
    tol-converge earlier (history length == max_iter proves no early
    stop fired). A testdata refresh that converges in fewer rounds
    must fail HERE with this message, not as a bare hash mismatch."""
    from gbif_filter_python_spark.operators.similarity import kmeans_fit

    emb = entry_mod._t(spark, sf, "embeddings")
    _, history = kmeans_fit(emb, k=8, max_iter=5)
    assert len(history) == 5, (
        f"k-means converged after {len(history)} iterations; the "
        "unrolled 5-iteration SQL oracle no longer replays the same "
        "fit — regenerate _kmeans_oracle with iters="
        f"{len(history)}."
    )


def test_semantic_dedup_oracle_preconditions(spark, sf):
    """PRECONDITIONS for the semantic_dedup oracle: (1) the k=16
    4-iteration fit on the perturbed set must not early-stop (the SQL
    unrolls exactly 4 rounds); (2) no within-cluster pair may sit
    near the 0.99 threshold (the float band where Spark and DuckDB
    could disagree) — planted pairs must be far above, everything
    else far below."""
    from gbif_filter_python_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )
    from gbif_filter_python_spark.operators.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    pe = entry_mod._perturbed_embeddings(spark, sf)
    centroids, history = kmeans_fit(pe, k=16, max_iter=4)
    assert len(history) == 4, (
        f"perturbed-set k-means converged after {len(history)} "
        "iterations; regenerate the semantic_dedup oracle with iters="
        f"{len(history)}."
    )
    a = kmeans_assign(pe, centroids, out_col="cluster").select(
        "cluster", F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    pairs = a.alias("l").join(
        a.alias("r"),
        (F.col("l.cluster") == F.col("r.cluster"))
        & (F.col("l.id") < F.col("r.id")),
    )
    sim = dot_product(F.col("l.v"), F.col("r.v")) / (
        l2_norm(F.col("l.v")) * l2_norm(F.col("r.v"))
    )
    n_danger = pairs.select(sim.alias("s")).filter(
        "s >= 0.985 AND s < 0.995"
    ).count()
    assert n_danger == 0, (
        f"{n_danger} within-cluster pairs sit within ±0.005 of the "
        "0.99 threshold — the semantic_dedup oracle's cross-engine "
        "float-determinism margin is gone."
    )


def test_k_core_fixpoint_within_unrolled_oracle_rounds(spark, sf):
    """The k_core oracle unrolls 7 peel rounds; the Spark fixpoint is
    measured at 5 on this corpus. If a data refresh deepens the
    cascade past 7, the oracle would report a not-yet-converged
    (larger) core — safe direction, but this asserts the margin by
    name first."""
    edges = entry_mod._item_graph_edges(spark, sf)
    sym = (
        edges.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(edges.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
        .localCheckpoint()
    )
    n = sym.count()
    rounds = 0
    while rounds < 20:
        keep = (
            sym.groupBy("src")
            .count()
            .filter(F.col("count") >= 10)
            .select("src")
        )
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.selectExpr("src AS dst"), "dst", "left_semi")
            .localCheckpoint()
        )
        n2 = sym.count()
        rounds += 1
        if n2 == n or n2 == 0:
            break
        n = n2
    assert rounds <= 7, (
        f"k=10 peel needs {rounds} rounds; regenerate the k_core "
        f"oracle with _kcore_oracle(10, {rounds + 2})."
    )


def test_k_truss_fixpoint_within_unrolled_oracle_rounds(spark, sf):
    """The k_truss oracle unrolls 9 peel rounds; the Spark fixpoint is
    measured at 7 on this corpus (k=8). Asserts the margin by name
    before a data refresh shows up as a bare hash mismatch."""
    from gbif_filter_python_spark.operators.graph import k_truss

    edges = entry_mod._item_graph_edges(spark, sf)
    cur = (
        edges.selectExpr(
            "least(id_a, id_b) AS a", "greatest(id_a, id_b) AS b"
        )
        .distinct()
        .localCheckpoint()
    )
    n = cur.count()
    rounds = 0
    while rounds < 20:
        e1 = cur.selectExpr("a AS x", "b AS y")
        e2 = cur.selectExpr("a AS y", "b AS z")
        e3 = cur.selectExpr("a AS x", "b AS z")
        tri = e1.join(e2, "y").join(e3, ["x", "z"])
        sup = (
            tri.selectExpr("x AS a", "y AS b")
            .unionAll(tri.selectExpr("y AS a", "z AS b"))
            .unionAll(tri.selectExpr("x AS a", "z AS b"))
            .groupBy("a", "b")
            .count()
        )
        cur = (
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("count"), F.lit(0)) >= 6)
            .select("a", "b")
            .localCheckpoint()
        )
        n2 = cur.count()
        rounds += 1
        if n2 == n or n2 == 0:
            break
        n = n2
    assert rounds <= 9, (
        f"k=8 truss peel needs {rounds} rounds; regenerate the "
        f"k_truss oracle with _ktruss_oracle(8, {rounds + 2})."
    )


def test_quantile_norm_cohorts_are_equal_sized(spark, sf):
    """PRECONDITION for the quantile_norm oracle (ADVICE r4):
    q_quantile_norm derives its four cohorts as doc_id % 4, and
    quantile_normalize raises unless the cohorts are EXACTLY equal —
    which holds iff count(documents) % 4 == 0 AND doc_ids are dense
    (each residue class equally populated). Assert both directly so a
    data refresh names this assumption instead of surfacing as a
    runtime ValueError inside a gated query."""
    docs = entry_mod._t(spark, sf, "documents")
    sizes = [
        r["n"]
        for r in docs.groupBy((F.col("doc_id") % 4).alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 4 and len(set(sizes)) == 1, (
        f"doc_id % 4 cohort sizes {sorted(sizes)} are unequal; "
        "q_quantile_norm's equal-size precondition no longer holds — "
        "re-derive cohorts (or re-truncate) before trusting the "
        "quantile_norm CORRECTNESS row."
    )
