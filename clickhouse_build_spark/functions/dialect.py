"""PG↔ClickHouse dialect expression library (SURVEY.md §2.8, F1–F9).

The reference's semantic core is its golden translation corpus mapping
Postgres scalar expressions to ClickHouse equivalents
(``src/corpus/orm_none.txt``, ``orm_drizzleorm.txt``). Each helper here is
one of those mappings expressed as a Spark ``Column`` builder, so engine
queries get the *agreed* semantics (the hard parts in SURVEY §7.4: NULL vs
empty-string labels, SUM-over-empty, date-trunc return type, deterministic
ordering) from one place.

All helpers emit built-in Spark expressions — they stay inside
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def empty_(c: Column | str) -> Column:
    """ClickHouse ``empty(s)`` — true for '' (and for replicated NULLs).

    Ref: ``src/corpus/orm_none.txt:464``. CH string replicas store NULL as
    '', so missing-ness is NULL-or-empty on the Spark side (SURVEY F6).
    """
    c = _col(c)
    return c.isNull() | (c == F.lit(""))


def if_(cond: Column, then: Column | str, otherwise: Column | str) -> Column:
    """ClickHouse ``if(cond, a, b)`` (ref: ``src/corpus/orm_none.txt:464``)."""
    return F.when(cond, _col(then)).otherwise(_col(otherwise))


def if_empty_label(c: Column | str, label: str = "Uncategorized") -> Column:
    """``if(empty(category),'Uncategorized',category)`` ≡ PG
    ``COALESCE(category,'Uncategorized')`` over replicated data.

    Treats NULL *and* '' as missing so PG-shaped and CH-shaped groupings
    agree (SURVEY §7.4 hard part #3).
    """
    c = _col(c)
    return F.when(empty_(c), F.lit(label)).otherwise(c)


def month_start(c: Column | str) -> Column:
    """``toStartOfMonth(date)`` / ``DATE_TRUNC('month', ts)`` (SURVEY F1).

    Canonical engine semantics are CH-shaped (SURVEY §7.4 hard part #1):
    a DATE at the first of the month, like ``toStartOfMonth``. PG's
    timestamp-shaped ``DATE_TRUNC`` is a presentation cast away.
    """
    return F.date_trunc("month", _col(c)).cast("date")


def to_f64(c: Column | str) -> Column:
    """``toFloat64(x)`` — cast before SUM (ref ``corpus/orm_drizzleorm.txt:453``)."""
    return _col(c).cast("double")


def to_date_(c: Column | str) -> Column:
    """``toDate(x)`` (ref ``corpus/orm_drizzleorm.txt:491``)."""
    return F.to_date(_col(c))


def coalesce_sum0(c: Column | str) -> Column:
    """Engine policy for SUM-over-empty: PG returns NULL, CH returns 0;
    both the app and the corpus coalesce to 0 (SURVEY F3/A10). We make
    ``COALESCE(SUM(x), 0)`` the single engine behavior."""
    return F.coalesce(F.sum(to_f64(c)), F.lit(0.0))


def total_order(*keys: Column | str, tiebreak: Column | str | None = None) -> list[Column]:
    """Deterministic ORDER BY: append an id tiebreaker so ties can't flap
    between runs/engines (SURVEY §7.4 hard part #5; the reference itself
    rewrote ``created_at`` ties to ``id`` — ``corpus/orm_none.txt:541``)."""
    cols = [_col(k) for k in keys]
    if tiebreak is not None:
        cols.append(_col(tiebreak))
    return cols


def round2(c: Column | str) -> Column:
    """Canonical presentation/hashing form for double aggregates
    (BASELINE.md canonicalization: ``round(double_aggs, 2)``)."""
    return F.round(_col(c), 2)


def count_if(cond: Column) -> Column:
    """ClickHouse ``countIf(cond)`` — the ``-If`` aggregate combinator
    as a conditional count (ANSI ``COUNT(*) FILTER (WHERE cond)``)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def sum_if(c: Column | str, cond: Column) -> Column:
    """ClickHouse ``sumIf(x, cond)`` (ANSI ``SUM(x) FILTER (WHERE cond)``)."""
    return F.sum(F.when(cond, _col(c)).otherwise(F.lit(0.0)))


def arg_max(value: Column | str, by: Column | str) -> Column:
    """ClickHouse ``argMax(value, by)`` — the value belonging to the
    row with the maximum ``by``. Built as max-of-struct so the whole
    thing stays one partially-aggregated expression (Spark's ``max_by``
    exists but gives no tie control; the struct form breaks ties by the
    value itself, deterministically)."""
    return F.max(F.struct(_col(by).alias("b"), _col(value).alias("v"))).getField("v")


def arg_min(value: Column | str, by: Column | str) -> Column:
    """ClickHouse ``argMin(value, by)`` (see :func:`arg_max`)."""
    return F.min(F.struct(_col(by).alias("b"), _col(value).alias("v"))).getField("v")


def current_date_() -> Column:
    """``CURRENT_DATE`` / CH ``today()`` (SURVEY F8) — the DDL-default
    expression for date columns. Evaluated once per query (Spark fixes
    ``current_date()`` at plan time), so every row in a batch gets the
    same value, matching both engines' per-statement semantics."""
    return F.current_date()


def now_() -> Column:
    """``now()`` / PG ``CURRENT_TIMESTAMP`` (SURVEY F8) — per-statement
    timestamp, fixed at plan time like :func:`current_date_`."""
    return F.current_timestamp()


def apply_column_defaults(df: DataFrame, defaults: dict[str, Column]) -> DataFrame:
    """Write-side DDL-default injection (SURVEY F8): the engine has no
    DDL layer, so ``DEFAULT CURRENT_DATE`` / ``DEFAULT now()`` column
    clauses are applied at write time — NULLs in a present column are
    filled with the default expression; an absent column is added
    outright. Use with :func:`current_date_` / :func:`now_`::

        apply_column_defaults(rows, {"date": current_date_()})

    Pure projection — no shuffle, stays in whole-stage codegen.
    """
    for name, default in defaults.items():
        if name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), default))
        else:
            df = df.withColumn(name, default)
    return df


def limit_by(
    df: DataFrame,
    n: int,
    by: list[str] | str,
    order_by: list[Column] | Column | None = None,
) -> DataFrame:
    """ClickHouse ``LIMIT n BY key`` — the first ``n`` rows per key
    group (a clause Spark SQL lacks; the translator cannot rewrite it
    function-wise, so it lives as a DataFrame helper).

    ``order_by`` fixes which rows are "first" (CH picks by physical
    order, which is nondeterministic in a distributed engine — callers
    must order explicitly for reproducible results).

    Plans as one window (row_number over the group) — a single shuffle
    on the BY key, no global sort.
    """
    from pyspark.sql import Window

    keys = [by] if isinstance(by, str) else list(by)
    if order_by is None:
        raise ValueError(
            "limit_by requires order_by: ClickHouse's physical-order "
            "semantics are nondeterministic under distribution"
        )
    orders = [order_by] if isinstance(order_by, Column) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*orders)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def sample_clause(
    df: DataFrame,
    key: Column | str,
    num: int,
    den: int,
    offset_num: int = 0,
) -> DataFrame:
    """ClickHouse ``SAMPLE num/den OFFSET offset_num/den`` — the
    deterministic table-sampling clause: a row is in the sample iff the
    hash of its sampling key lands in the ``[offset, offset + num)``
    band of the hash space (CH hashes the table's SAMPLE BY key into
    [0, 2^64); here the portable md5 family's 32-bit space so the
    DuckDB oracle evaluates the identical predicate).

    Unlike ``df.sample()`` (seeded pseudo-random per partition, not
    reproducible across engines or repartitionings), the hash band is a
    pure row-local predicate: stable under shuffle, evaluated inside
    the scan stage before anything wider runs, and consistent across
    queries — two queries sampling 1/8 see the SAME rows, and OFFSET
    bands never overlap, which is what makes CH-style incremental
    sampling (``1/8 OFFSET 3/8``) work.
    """
    from clickhouse_build_spark.operators.dedup import portable_hash

    lo, hi = _sample_band(num, den, offset_num)
    h = portable_hash(_col(key) if isinstance(key, str) else key, "sample")
    return df.filter((h >= F.lit(lo)) & (h < F.lit(hi)))


def _sample_band(num: int, den: int, offset_num: int) -> tuple[int, int]:
    """Shared (lo, hi) of the hash band — ALL sample forms validate
    here, so a translator string can't silently produce an empty or
    clipped band the Column form would have refused."""
    if not (0 < num <= den and 0 <= offset_num and offset_num + num <= den):
        raise ValueError(
            f"SAMPLE {num}/{den} OFFSET {offset_num}/{den}: "
            "requires 0 < num and offset + num <= den"
        )
    space = 1 << 32
    return space * offset_num // den, space * (offset_num + num) // den


def sample_clause_sql(key_expr: str, num: int, den: int, offset_num: int = 0) -> str:
    """The DuckDB-side twin of :func:`sample_clause` (for oracle SQL)."""
    from clickhouse_build_spark.operators.dedup import portable_hash_sql

    lo, hi = _sample_band(num, den, offset_num)
    h = portable_hash_sql(key_expr, "sample")
    return f"({h} >= {lo} AND {h} < {hi})"


def sample_clause_spark_sql(
    key_expr: str, num: int, den: int, offset_num: int = 0
) -> str:
    """The Spark-SQL text form of :func:`sample_clause`'s band predicate
    (for the CH-dialect translator's ``SAMPLE`` clause rewrite). Same
    portable md5 band as the Column/DuckDB twins — all three evaluate
    the identical predicate through the shared hash family
    (``operators/dedup.py:portable_hash*``) and band arithmetic."""
    from clickhouse_build_spark.operators.dedup import portable_hash_spark_sql

    lo, hi = _sample_band(num, den, offset_num)
    h = portable_hash_spark_sql(key_expr, "sample")
    return f"({h} >= {lo} AND {h} < {hi})"
