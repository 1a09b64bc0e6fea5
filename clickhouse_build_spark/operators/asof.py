"""As-of join (ClickHouse ``ASOF JOIN`` — SURVEY §2.3 stretch).

For every left row, attach the single right row with the largest
``right_ts ≤ left_ts`` within the same key (``direction="backward"``;
the standard market-data/event-enrichment join).

Spark has no native as-of join. The naive range join explodes
(|left|×|right matches in range| rows before the per-row argmax); the
scalable form used here is **union + ordered window carry-forward**:

1. tag both sides and union them on (key, ts),
2. one window per key ordered by (ts, side) where the last non-null
   right-row STRUCT carries the most recent right row forward (a
   struct, not per-column lasts — independent per-column carries would
   blend values from different right rows when right columns hold
   NULLs),
3. keep the left rows.

Cost: ONE shuffle on the key (the same partitioning both inputs would
need anyway), no row explosion, no per-row subquery — this is the plan
that survives 100 TB of ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join → left columns + ``<right_col><suffix>``
    columns (NULL when no right row precedes the left row).

    Ties (``right_ts == left_ts``): the right row at exactly the left
    timestamp matches (ClickHouse ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics) — the union orders right rows BEFORE left rows at equal
    timestamps so the carry-forward has already seen them. Multiple
    right rows at the same (key, ts) resolve to the last in (ts, col)
    order only if the caller pre-dedupes; feed a latest-per-key view
    for deterministic ties.
    """
    rstruct = F.struct(*[F.col(c) for c in right_cols])
    rtype = (
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols)
        + ">"
    )
    ltype = (
        "struct<"
        + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema)
        + ">"
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtype).alias("__rrow"),
        F.struct(*left.columns).alias("__lrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # 0 < 1: right sorts first at equal ts
        rstruct.alias("__rrow"),
        F.lit(None).cast(ltype).alias("__lrow"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__c"),
    )
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return carried.filter(F.col("__side") == 1).select(*out_left, *out_right)
