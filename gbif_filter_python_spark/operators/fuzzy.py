"""Blocked fuzzy (edit-distance) join.

The reference resolves names EXACT-only (``strict=True`` passed to
``species.name_backbone``, /root/reference/gbif_helper.py:18, so GBIF
never fuzzy-matches — SURVEY.md §2-A). Real taxon lists carry typos;
this operator is the opt-in fuzzy extension: a candidate join gated by
cheap blocking predicates, then the exact Levenshtein filter.

Scale design: a naive edit-distance join is a cross join (O(n·m)
Levenshtein calls — dead at any scale). Blocking makes it an
EQUI-join: candidates must share the lowercased first character and
have lengths within ``max_distance`` (both NECESSARY conditions for
edit distance ≤ d only in the length case; the first-character block
is a deliberate recall trade documented in the signature — typos in
the first letter are rare). The length band uses the same
explode-one-side trick as range_join: the left row keeps its single
(char, len) key while the right side is replicated across its
2·d + 1 qualifying lengths, so every candidate pair meets exactly
once and the expensive Levenshtein runs only inside blocks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Pairs with ``levenshtein(lower(left_col), lower(right_col)) <=
    max_distance`` among candidates sharing the first character and a
    length within ``max_distance``. Adds a ``levenshtein`` column.

    Blocking is part of the semantics: a match whose first characters
    differ is NOT returned (documented recall trade; run with a second
    blocking key — e.g. soundex — unioned in, if first-letter typos
    matter).
    """
    if how != "inner":
        raise ValueError("fuzzy_join supports inner joins only")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    d = max_distance
    lb = left.withColumns(
        {
            "_c1": F.substring(F.lower(F.col(left_col)), 1, 1),
            "_len": F.length(left_col),
        }
    )
    rb = right.withColumns(
        {
            "_c1": F.substring(F.lower(F.col(right_col)), 1, 1),
            "_rlen": F.length(right_col),
        }
    ).withColumn(
        "_len", F.explode(F.sequence(F.col("_rlen") - d, F.col("_rlen") + d))
    )
    dist = F.levenshtein(F.lower(F.col(left_col)), F.lower(F.col(right_col)))
    return (
        lb.join(rb, ["_c1", "_len"], "inner")
        .withColumn("levenshtein", dist)
        .filter(F.col("levenshtein") <= d)
        .drop("_c1", "_len", "_rlen")
    )


def fuzzy_resolve_candidates(
    names: DataFrame,
    taxonomy: DataFrame,
    name_col: str = "_name",
    max_distance: int = 2,
) -> DataFrame:
    """Fuzzy candidates for names that failed exact resolution:
    (input name, canonical_name, key, levenshtein), nearest-first per
    name. A UNIQUE minimum-distance candidate is the safe auto-accept;
    ties should stay unresolved (mirrors the EXACT-or-nothing
    ambiguity rule of operators/resolution.py applied at distance d).
    """
    dim = taxonomy.select(
        F.col("canonical_name").alias("_cand_name"),
        F.when(F.col("is_synonym"), F.col("accepted_key"))
        .otherwise(F.col("key"))
        .alias("_cand_key"),
    )
    return fuzzy_join(
        names, dim, name_col, "_cand_name", max_distance=max_distance
    )


def er_match_scores(
    records: DataFrame,
    pairs: DataFrame,
    comparators: list[dict],
    id_col: str = "id",
    match_threshold: float = 6.0,
    possible_threshold: float = 0.0,
) -> DataFrame:
    """Fellegi-Sunter-style entity-resolution scoring over blocked
    candidate pairs: per-field agreement weights summed into a match
    score, thresholded into ``match`` / ``possible`` / ``nonmatch``
    (Fellegi & Sunter 1969, the probabilistic record-linkage
    standard; weights are log-likelihood ratios in the classical
    setup — here caller-supplied constants, trainable offline).

    ``comparators`` is a list of field specs::

        {"col": "name",    "kind": "edit",    "param": 2,
         "w_agree": 4.0, "w_disagree": -2.0}
        {"col": "nation",  "kind": "exact",
         "w_agree": 1.5, "w_disagree": -1.5}
        {"col": "balance", "kind": "abs_tol", "param": 0.01, ...}
        {"col": "name",    "kind": "prefix",  "param": 8, ...}

    A field where EITHER side is NULL contributes weight 0 (the
    missing-comparison convention). Returns ``(id_a, id_b, <col>_agree
    flags, score, decision)``.

    Scale shape: pure Column expressions over the candidate-pair join
    — records join in twice by id (broadcast when the dimension side
    is small; sort-merge otherwise), no UDFs; the expensive comparator
    (edit distance) runs only on BLOCKED candidates, never n². Weights
    should be binary-exact literals (multiples of 0.25) so the score
    sum is bit-identical across engines and replay runs.
    """
    kinds = {"exact", "prefix", "abs_tol", "edit"}
    for c in comparators:
        if c.get("kind") not in kinds:
            raise ValueError(
                f"comparator kind must be one of {sorted(kinds)}, "
                f"got {c.get('kind')!r}"
            )
    cols = sorted({c["col"] for c in comparators})
    a = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_a_{c}") for c in cols],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in cols],
    )
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")

    out_cols = [F.col("id_a"), F.col("id_b")]
    score = F.lit(0.0)
    for spec in comparators:
        col, kind = spec["col"], spec["kind"]
        av, bv = F.col(f"_a_{col}"), F.col(f"_b_{col}")
        if kind == "exact":
            agree = av == bv
        elif kind == "prefix":
            p = int(spec["param"])
            agree = F.substring(av, 1, p) == F.substring(bv, 1, p)
        elif kind == "abs_tol":
            agree = F.abs(av - bv) <= F.lit(float(spec["param"]))
        else:  # edit
            agree = F.levenshtein(av, bv) <= int(spec["param"])
        known = av.isNotNull() & bv.isNotNull()
        tri = F.when(~known, F.lit(None).cast("boolean")).otherwise(agree)
        out_cols.append(tri.alias(f"{col}_{kind}_agree"))
        score = score + (
            F.when(~known, F.lit(0.0))
            .when(agree, F.lit(float(spec["w_agree"])))
            .otherwise(F.lit(float(spec["w_disagree"])))
        )
    decision = (
        F.when(score >= match_threshold, F.lit("match"))
        .when(score >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("nonmatch"))
    )
    return joined.select(
        *out_cols, score.alias("score"), decision.alias("decision")
    )


def jaro_winkler_py(a: str | None, b: str | None) -> float | None:
    """Jaro-Winkler similarity in the classic strcmp95 conventions
    (Winkler 1990): greedy row-major match-window pairing,
    transpositions = differing matched positions INTEGER-halved, the
    0.7 boost threshold (prefix bonus only when jaro > 0.7, p = 0.1,
    prefix cap 4). These are exactly DuckDB's native
    ``jaro_winkler_similarity`` semantics — validated mismatch-free
    against it on 7 653 real name pairs plus a 7 000-pair fuzz — so
    the oracle for :func:`jaro_winkler` is a genuinely INDEPENDENT
    second implementation, not a replay. (A no-threshold,
    float-halved variant differs on ~15% of real pairs; the query
    would hash-fail instantly if either convention drifted.)
    NULL-propagating; either string empty → 0.0."""
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    sa = [a[i] for i in range(la) if match_a[i]]
    sb = [b[j] for j in range(lb) if match_b[j]]
    t = sum(1 for x, y in zip(sa, sb) if x != y) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro <= 0.7:  # strcmp95 boost threshold
        return jaro
    prefix = 0
    for x, y in zip(a, b):
        if x != y or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def jaro_winkler(col_a, col_b):
    """Column-level Jaro-Winkler similarity via an Arrow-batched
    pandas UDF (the character-level greedy matching has no JVM
    built-in — Spark ships only levenshtein; this is the UDF-slow-path
    exception the module's comparators otherwise avoid). Use INSIDE
    blocks (fuzzy_join / sorted_neighborhood blocking), never across
    a cross join."""

    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler_py(x, y) for x, y in zip(a, b)],
            dtype="float64",
        )

    return _jw(col_a, col_b)


def pair_eval(
    pred_pairs: DataFrame,
    true_pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    round_dp: int = 6,
) -> DataFrame:
    """Pair-level linkage evaluation — the scorecard that closes the
    entity-resolution loop (:func:`sorted_neighborhood_pairs` blocks,
    :func:`er_match_scores` decides, this grades): ONE row
    ``(n_true, n_pred, tp, fp, fn, precision, recall, f1)`` comparing
    predicted match pairs against ground truth. Both inputs are
    canonicalized (unordered, deduplicated, self-pairs dropped) so
    callers can pass raw pair frames in either orientation. The
    standard ER caveat applies and is the caller's choice to handle:
    pair-level recall punishes missed BLOCKS twice — evaluate against
    the transitive closure of truth if clusters matter.

    Scale shape: two distinct-aggregations + one equi-join on the
    canonical (a, b) key + scalar reductions; pair frames only, never
    the record table.
    """

    def canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    p, t = canon(pred_pairs), canon(true_pairs)
    tp = p.join(t, ["a", "b"]).agg(F.count(F.lit(1)).alias("tp"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_pred"))
    nt = t.agg(F.count(F.lit(1)).alias("n_true"))
    out = tp.crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nt))
    # an empty predicted (or truth) set leaves its ratio undefined —
    # NULL, not an ANSI DIVIDE_BY_ZERO crash (a threshold that yields
    # zero 'match' decisions is a routine matcher outcome); f1 is
    # NULL whenever either side is undefined, 0 when defined but
    # pointless
    prec = F.when(
        F.col("n_pred") > 0,
        F.col("tp") / F.col("n_pred").cast("double"),
    )
    rec = F.when(
        F.col("n_true") > 0,
        F.col("tp") / F.col("n_true").cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull(),
        F.when(
            prec + rec > 0, 2 * prec * rec / (prec + rec)
        ).otherwise(0.0),
    )
    return out.select(
        "n_true",
        "n_pred",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_true") - F.col("tp")).alias("fn"),
        F.round(prec, round_dp).alias("precision"),
        F.round(rec, round_dp).alias("recall"),
        F.round(f1, round_dp).alias("f1"),
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int,
    round_dp: int = 6,
) -> DataFrame:
    """Blocking-stage scorecard (Christen 2012, "Data Matching",
    ch. 4.2): BEFORE grading the matcher (:func:`pair_eval`), grade
    the blocker — did the candidate generator keep the true matches
    while discarding the quadratic pair space?

    * ``pairs_completeness`` = |candidates ∩ truth| / |truth| — the
      recall CEILING of any downstream matcher (a true pair the
      blocker drops can never be matched);
    * ``reduction_ratio`` = 1 − |candidates| / C(n_records, 2) — the
      fraction of the all-pairs space the blocker eliminated (the
      whole point of blocking: 1 − ~1e-9 at 100 TB scale).

    Both frames are canonicalized to ``least/greatest`` id order and
    deduplicated, so orientation and repeats can't inflate either
    metric. One row out: ``(n_records, n_candidates, n_truth,
    true_in_candidates, pairs_completeness, reduction_ratio)``.

    Scale shape: pair frames only — two distinct-aggs and one
    pair-keyed join; the records table is never touched (``n_records``
    arrives as a count the caller already has).
    """
    if n_records < 2:
        raise ValueError(f"n_records must be >= 2, got {n_records}")

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        ).filter(F.col("a") != F.col("b")).distinct()

    cand, tru = canon(candidates), canon(truth)
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_tru = tru.agg(F.count(F.lit(1)).alias("n_truth"))
    tp = cand.join(tru, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("true_in_candidates")
    )
    all_pairs = float(n_records) * (n_records - 1) / 2.0
    return (
        n_cand.crossJoin(n_tru)
        .crossJoin(tp)
        .select(
            F.lit(int(n_records)).alias("n_records"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("true_in_candidates").cast("long").alias(
                "true_in_candidates"
            ),
            F.round(
                F.when(
                    F.col("n_truth") > 0,
                    F.col("true_in_candidates") / F.col("n_truth"),
                ),
                round_dp,
            ).alias("pairs_completeness"),
            F.round(
                1.0 - F.col("n_candidates") / F.lit(all_pairs), round_dp
            ).alias("reduction_ratio"),
        )
    )


def bcubed_eval(
    assignments: DataFrame,
    item_col: str = "item",
    pred_col: str = "pred_cluster",
    true_col: str = "true_cluster",
    round_dp: int = 6,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998; the
    Amigó et al. 2009 survey's recommended extrinsic metric): per-item
    precision ``|C_pred(i) ∩ C_true(i)| / |C_pred(i)|`` and recall
    ``… / |C_true(i)|``, averaged over items. Unlike pair-level P/R
    (:func:`pair_eval`), B³ scores every item — singletons included —
    and weights errors by cluster size, which is what a dedup-cluster
    release actually cares about (one giant wrong cluster hurts
    proportionally to its size, not by one pair-count).

    Input is an ASSIGNMENT table (item, pred cluster id, true cluster
    id — one row per item). Returns one row: ``(n_items,
    bcubed_precision, bcubed_recall, bcubed_f1)``.

    Scale shape: ONE hash aggregate over the assignment table — the
    pred×true contingency cells — with the pred/true cluster sizes
    re-aggregated FROM the cell table (never a second pass over the
    items, the :func:`cluster_agreement` shape). Every item in the
    same (pred, true) cell has the identical per-item precision
    ``_ix/_sp`` and recall ``_ix/_st``, so the per-item averages are
    the cell-weighted sums ``Σ _ix·(_ix/_sp) / n`` — the n-row
    assignment spine never joins back or shuffles again. Cell joins
    are keyed by cluster id; intersection cells are at most
    min(|pred clusters| × avg overlap, n_items).
    """
    asg = assignments.select(
        F.col(item_col).alias("_i"),
        F.col(pred_col).alias("_pc"),
        F.col(true_col).alias("_tc"),
    ).filter(F.col("_pc").isNotNull() & F.col("_tc").isNotNull())
    ix = asg.groupBy("_pc", "_tc").agg(F.count(F.lit(1)).alias("_ix"))
    sp = ix.groupBy("_pc").agg(F.sum("_ix").alias("_sp"))
    st = ix.groupBy("_tc").agg(F.sum("_ix").alias("_st"))
    per = (
        ix.join(sp, "_pc")
        .join(st, "_tc")
        .select(
            F.col("_ix"),
            (F.col("_ix") * (F.col("_ix") / F.col("_sp"))).alias("_wp"),
            (F.col("_ix") * (F.col("_ix") / F.col("_st"))).alias("_wr"),
        )
    )
    tot = per.agg(
        F.coalesce(F.sum("_ix"), F.lit(0)).alias("_n"),
        F.sum("_wp").alias("_swp"),
        F.sum("_wr").alias("_swr"),
    )
    avg_p = F.when(F.col("_n") > 0, F.col("_swp") / F.col("_n"))
    avg_r = F.when(F.col("_n") > 0, F.col("_swr") / F.col("_n"))
    return tot.select(
        F.col("_n").cast("long").alias("n_items"),
        F.round(avg_p, round_dp).alias("bcubed_precision"),
        F.round(avg_r, round_dp).alias("bcubed_recall"),
        F.round(
            2 * avg_p * avg_r / (avg_p + avg_r),
            round_dp,
        ).alias("bcubed_f1"),
    )


def cluster_agreement(
    assignments: DataFrame,
    item_col: str = "item",
    pred_col: str = "pred_cluster",
    true_col: str = "true_cluster",
    round_dp: int = 6,
) -> DataFrame:
    """Partition-agreement metrics between a predicted and a reference
    clustering: Adjusted Rand Index (Hubert & Arabie 1985) and
    Normalized Mutual Information (arithmetic normalization, Strehl &
    Ghosh 2002) — the two standard chance-corrected companions to
    :func:`bcubed_eval` when comparing two dedup/ER cluster releases
    (B³ is per-item and asymmetric-error-weighted; ARI/NMI are
    pair-level and information-theoretic, so a release diff report
    wants all three).

    Input is the same assignment table as ``bcubed_eval`` (one row per
    item). Returns one row ``(n_items, ari, nmi)``:

    - ARI = (Σ_ij C(n_ij,2) − E) / (½(Σ_i C(a_i,2) + Σ_j C(b_j,2)) − E)
      with E = Σ_i C(a_i,2)·Σ_j C(b_j,2)/C(n,2); 1.0 by convention
      when the denominator is 0 (both partitions all-singleton or
      single-cluster — they are then identical as pair sets).
    - NMI = MI / ((H_pred + H_true)/2) with natural-log entropies;
      1.0 when both entropies are 0, else 0.0 when MI is 0.

    Scale shape: one contingency hash aggregate (≤ n_items cells) +
    two marginal aggregates derived FROM the contingency table (never
    a second pass over the items), then a three-way broadcast-join of
    the cell table with its own tiny marginals for the MI sum — no
    pairwise counting anywhere (the C(·,2) identities do the pair
    math inside per-cell arithmetic).
    """
    asg = assignments.select(
        F.col(item_col).alias("_i"),
        F.col(pred_col).alias("_pc"),
        F.col(true_col).alias("_tc"),
    ).filter(F.col("_pc").isNotNull() & F.col("_tc").isNotNull())
    cells = asg.groupBy("_pc", "_tc").agg(F.count(F.lit(1)).alias("_nij"))
    pa = cells.groupBy("_pc").agg(F.sum("_nij").alias("_a"))
    pb = cells.groupBy("_tc").agg(F.sum("_nij").alias("_b"))

    def _c2(c):  # exact pair count n*(n-1)/2 in long arithmetic
        return (c * (c - F.lit(1))) / F.lit(2)

    tot = (
        cells.agg(
            F.sum("_nij").alias("_n"),
            F.sum(_c2(F.col("_nij"))).alias("_sc"),
        )
        .crossJoin(
            F.broadcast(pa.agg(F.sum(_c2(F.col("_a"))).alias("_sa")))
        )
        .crossJoin(
            F.broadcast(pb.agg(F.sum(_c2(F.col("_b"))).alias("_sb")))
        )
    )
    # MI and entropies need n inside per-cell terms: broadcast the
    # one-row totals onto the cell/marginal tables
    n_row = F.broadcast(tot.select("_n"))
    mi = (
        cells.join(F.broadcast(pa), "_pc")
        .join(F.broadcast(pb), "_tc")
        .crossJoin(n_row)
        .select(
            (
                (F.col("_nij") / F.col("_n"))
                * F.log(
                    (F.col("_nij") * F.col("_n"))
                    / (F.col("_a") * F.col("_b"))
                )
            ).alias("_t")
        )
        .agg(F.sum("_t").alias("_mi"))
    )
    hp = (
        pa.crossJoin(n_row)
        .select(
            (-(F.col("_a") / F.col("_n")) * F.log(F.col("_a") / F.col("_n")))
            .alias("_t")
        )
        .agg(F.sum("_t").alias("_hp"))
    )
    ht = (
        pb.crossJoin(n_row)
        .select(
            (-(F.col("_b") / F.col("_n")) * F.log(F.col("_b") / F.col("_n")))
            .alias("_t")
        )
        .agg(F.sum("_t").alias("_ht"))
    )
    j = (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hp))
        .crossJoin(F.broadcast(ht))
    )
    exp_c = (F.col("_sa") * F.col("_sb")) / _c2(F.col("_n"))
    ari_den = (F.col("_sa") + F.col("_sb")) / 2 - exp_c
    h_mean = (F.col("_hp") + F.col("_ht")) / 2
    return j.select(
        F.col("_n").cast("long").alias("n_items"),
        F.round(
            F.when(F.col("_n") < 2, F.lit(None).cast("double"))
            .when(F.abs(ari_den) < 1e-12, F.lit(1.0))
            .otherwise((F.col("_sc") - exp_c) / ari_den),
            round_dp,
        ).alias("ari"),
        F.round(
            F.when(h_mean > 0, F.col("_mi") / h_mean)
            .when(F.col("_n") >= 1, F.lit(1.0))
            .otherwise(F.lit(None).cast("double")),
            round_dp,
        ).alias("nmi"),
    )
