"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles skewed *joins* automatically, but a
pathologically hot key in a high-cardinality aggregation still lands on one
reducer. The classic fix is salting: aggregate on (key, salt) first — spreading
the hot key over N partitions — then re-aggregate on the key. For algebraic
aggregates (count/sum/min/max) the two-phase result is exactly the one-phase
result; tests/test_skew.py asserts it.

When to use at 100 TB: only when a profile shows a hot key (AQE's shuffle
stats, or a `groupBy(key).count()` sample). Salting costs one extra exchange
on the already-reduced data, so it's a targeted tool, not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """groupBy(key).agg(sum(value), count(*)) with a salt pre-phase.

    Phase 1 shuffles on (key, salt) — a deterministic hash of a unique-ish
    expression, not rand(), so results are reproducible; phase 2 folds the
    ≤ n_salts partial rows per key."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.sum(value).alias("_s"),
            F.count(F.lit(1)).alias("_c"),
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("_s").alias(f"sum_{value}"),
        F.sum("_c").alias("cnt"),
    )
