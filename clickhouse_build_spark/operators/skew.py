"""Skew-mitigation helpers (SURVEY §4 "100 TB hygiene": salting for
skewed keys).

AQE's skew-join handling (on by default in session.py) splits oversized
*sort-merge* partitions at runtime and is the first line of defense.
Salting is the explicit fallback for the cases AQE can't fix — a
shuffle-hash/grouped aggregate on a pathological key, or a key so hot
it dominates even a split partition. Trade-off: the small side is
replicated ``n_salts``× — use single-digit salt counts on genuinely
skewed joins, not everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``n_salts``
    shuffle partitions.

    Big side: each row gets a salt in [0, n_salts) — ``F.rand`` with a
    fixed seed, so the spread is uniform even when every attribute of
    the skewed rows is identical (a content-derived salt would send
    identical rows to the same partition, defeating the point; the
    fixed seed keeps a given run's plan deterministic). Small side:
    replicated once per salt via ``explode(sequence(...))``. The join
    key becomes (key…, salt), so no single reducer sees a hot key's
    full row set.

    Result equals ``big.join(small, on, how)`` row-for-row for inner
    and left joins (each big row matches exactly its salt's replica).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} — a right/"
            "full join salted this way would duplicate unmatched small rows"
        )
    big_s = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")


def salted_group_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase grouped count for a skewed key: pre-aggregate on
    (key, salt) — spreading the hot key over ``n_salts`` reducers —
    then combine the partials. Equivalent to ``groupBy(key).count()``;
    the first shuffle is the one map-side combine already bounds, the
    second carries ≤ ``n_salts`` rows per key."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("count"))
