"""Skew mitigation — salted joins and salted aggregation.

AQE's skew-join handling (on by default in session.py) covers most
cases at runtime by splitting oversized partitions. These explicit
variants cover the cases AQE can't: a skewed *broadcast-ineligible*
dimension join where one key (a mega-taxon like `Aves`, a null-ish
default key) dominates, and high-cardinality-per-key aggregations.

Salting trades one shuffle's skew for a bounded fan-out: the skewed
(probe) side gets a random salt in [0, salt); the build side is
replicated `salt` times. Replication cost is `salt × |build|`, so use
it only when the build side is small-ish but above the broadcast
threshold, or when a handful of hot keys are known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted.

    ``F.rand`` is seeded per-task by Spark; determinism of *results* is
    preserved (the salt only routes rows, every pair still meets
    exactly once because the right side carries all salt values).

    Only ``inner`` and ``left`` joins are salting-safe: the right side
    is exploded once per salt value, so right/full-outer joins would
    emit each unmatched right row ``salt`` times, and anti/semi joins
    against the salted condition are wrong too.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how in {'inner', 'left'}: the salted "
            f"right side replicates unmatched rows under {how!r} joins"
        )
    salted_left = left.withColumn(
        "_salt", (F.rand() * salt).cast("int")
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (salted_left[left_key] == exploded_right[right_key]) & (
        salted_left["_salt"] == exploded_right["_salt"]
    )
    out = salted_left.join(exploded_right, cond, how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: pre-aggregate on (keys, salt), then
    final-aggregate on keys. Only sum/count/min/max re-aggregate
    associatively, so those are what's supported.

    Spark's hash aggregate already does map-side partial aggregation;
    this helps when per-key state is huge (e.g. collect-heavy) or when
    a single reducer key dominates even after partials.
    """
    allowed = {"sum", "count", "min", "max"}
    bad = {a for a in agg_exprs.values() if a not in allowed}
    if bad:
        raise ValueError(f"two_phase_agg supports {allowed}, got {bad}")
    salted = df.withColumn("_salt", (F.rand() * salt).cast("int"))
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[
            getattr(F, agg)(c).alias(f"_p_{c}")
            for c, agg in agg_exprs.items()
        ]
    )
    refold = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(*group_cols).agg(
        *[
            getattr(F, refold[agg])(f"_p_{c}").alias(f"{agg}_{c}")
            for c, agg in agg_exprs.items()
        ]
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom-filter prefilter on the fact side — the
    standard move when the dim side is too big to BROADCAST-join but
    the join is SELECTIVE (most fact rows match nothing).

    A plain shuffle join moves the ENTIRE fact table. Here the dim
    keys fold into a dense Bloom bit array built with pure Column ops
    (``bloom_filter_agg`` is not SQL-exposed, and ``stat.bloomFilter``
    lands driver-side where only a slow Python UDF could probe it):

    * build — each key explodes to its k hash positions; one hash
      aggregation ORs them into ≤ m/64 ``(word_idx, bits)`` rows
      (map-side combined), assembled into a single-row map. Size is
      m bits regardless of dim cardinality (~1.2 MB for 10⁶ keys at
      1 % fpp) — broadcastable even when the dim itself is not;
    * probe — the fact crossJoins the broadcast 1-row filter and
      tests its k bit positions with JVM bit ops (``forall`` over the
      hash sequence). Map-only: rows are dropped BEFORE the exchange.

    With 1 % join selectivity the shuffle moves ~1 % + fpp of the
    fact bytes. False positives only waste shuffle (the real join
    still decides membership), never change results — the output is
    exactly the plain join's, which is what the oracle checks.

    Only ``inner``/``left_semi`` are prefilter-safe: outer joins need
    the dropped rows."""
    import math

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom prefilter drops fact rows; only inner/left_semi "
            f"are safe, got {how!r}"
        )
    n = max(1, expected_items)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    n_words = (m + 63) // 64
    one = F.lit(1).cast("long")

    # Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i·h2) mod m
    # from TWO xxhash64 evaluations instead of k — and both operands
    # are pre-reduced mod m so i·h2 stays far under 2^63 (ANSI-safe).
    def positions(col):
        h1 = F.pmod(F.xxhash64(col), F.lit(m))
        h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m))
        return [
            F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)
        ]

    pos_df = dim.select(
        F.explode(F.array(*positions(F.col(dim_key)))).alias("_pos")
    )
    sparse = (
        pos_df.select(
            F.floor(F.col("_pos") / 64).cast("long").alias("_w"),
            F.call_function(
                "shiftleft", one, (F.col("_pos") % 64).cast("int")
            ).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_word"))
    )
    # Dense assembly: ALL word indices left-join the sparse set, then
    # one sorted collect into an array<long>. element_at on an ARRAY
    # is O(1) positional access — a MAP here is an array of pairs that
    # element_at scans LINEARLY, which measured 21 s (vs sub-second)
    # for 600 k probes against a 15 k-entry filter.
    idx = dim.sparkSession.range(n_words).select(F.col("id").alias("_w"))
    bloom = (
        idx.join(sparse, "_w", "left")
        .select("_w", F.coalesce(F.col("_word"), F.lit(0).cast("long")).alias("_word"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_w", "_word"))),
                lambda s: s["_word"],
            ).alias("_ba")
        )
    )

    # The k bit tests are a PLAIN expression conjunction, not a
    # forall-lambda: a higher-order function whose lambda captures
    # attributes from both join sides trips Catalyst reference binding
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) when it becomes the
    # nested-loop join condition. k is small (~7 at 1 % fpp), so the
    # expanded tree is tiny.
    hit = F.lit(True)
    for p in positions(F.col(fact_key)):
        word = F.element_at(
            F.col("_ba"), (F.floor(p / 64) + 1).cast("int")
        )
        bit = F.call_function("shiftleft", one, (p % 64).cast("int"))
        hit = hit & (word.bitwiseAND(bit) != 0)
    pre = fact.join(F.broadcast(bloom), on=hit, how="inner").drop("_ba")
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Pre-flight join-size / skew probe: the exact output
    cardinality of ``left ⋈ right`` on an equi-key is
    ``Σ_k cnt_l(k) · cnt_r(k)`` — computable from two per-key count
    aggregates WITHOUT running the join. Returns the ``top_n``
    hottest keys ``(key, n_left, n_right, pairs, share)`` ordered by
    contribution (key ascending on ties), where ``share`` is the
    key's fraction of total output pairs — the number that tells you
    BEFORE a 100 TB shuffle whether one key will own a reducer (and
    whether `salted_join` above is warranted).

    Scale shape: two hash aggregates with map-side combine (shuffles
    carry distinct keys only), one equi-join of the two count frames
    (distinct-key sized, never the facts), a single-row total
    broadcast back, and a global top-n (TakeOrdered — no full sort).
    """
    lc = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    pairs = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("pairs"),
    )
    total = pairs.agg(F.sum("pairs").alias("_total"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_left",
            "n_right",
            "pairs",
            F.when(
                F.col("_total") > 0,
                F.round(F.col("pairs") / F.col("_total"), round_dp),
            ).alias("share"),
        )
        .orderBy(F.desc("pairs"), F.asc("key"))
        .limit(top_n)
    )
