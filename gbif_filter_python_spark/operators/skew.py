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
