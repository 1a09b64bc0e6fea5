"""asof_join edge cases: no-preceding-row NULLs, equal-ts tie matching,
and the struct carry (NULL-bearing right columns must not blend values
from different right rows)."""

from __future__ import annotations

from clickhouse_build_spark.operators.asof import asof_join


def test_asof_basic_tie_and_missing(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 7, "lx")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 10, "r@10"), (1, 15, "r@15")], ["k", "rts", "rv"]
    )
    got = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rv"]
        ).collect()
    }
    assert got == {
        "l0": None,  # nothing at or before ts=5
        "l1": "r@10",  # exact-ts tie matches (ClickHouse >= semantics)
        "l2": "r@15",  # latest preceding wins
        "lx": None,  # key 2 has no right rows at all
    }


def test_asof_struct_carry_does_not_blend_rows(spark):
    # right rows with complementary NULLs: a per-column carry would
    # merge x from row A with y from row B; the struct carry must not.
    left = spark.createDataFrame([(1, 30, "l")], ["k", "ts", "lv"])
    right = spark.createDataFrame(
        [(1, 10, 1, None), (1, 20, None, 2)],
        "k long, rts long, x long, y long",
    )
    [row] = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["x", "y"]
    ).collect()
    assert (row.x_asof, row.y_asof) == (None, 2)  # the ts=20 row, as-is
