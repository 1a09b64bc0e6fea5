"""Z-order clustering (operators/zorder.py): Morton-key correctness
against a bit-twiddling reference, and the data-skipping property
verified against REAL parquet footer stats — a Z-ordered layout bounds
per-file spans in BOTH dimensions, a single-column sort does not."""

import glob

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clickhouse_build_spark.catalog import load_tables
from clickhouse_build_spark.operators.zorder import (
    ZORDER_BITS,
    zorder_key,
    zorder_write,
)
from clickhouse_build_spark.plans import REGISTRY

SF = "/root/testdata/sf0.01"


def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_bit_reference(spark):
    rng = np.random.default_rng(5)
    rows = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, 1 << ZORDER_BITS, 200),
            rng.integers(0, 1 << ZORDER_BITS, 200),
        )
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton_ref(a, b, ZORDER_BITS), (a, b)


def test_profile_buckets_are_quadrants(spark):
    # every coarse Morton bucket bounds BOTH dims to 1/8 of the keyed
    # space (3 prefix bits per dimension)
    rows = REGISTRY["orders_zorder_profile"].builder(spark, SF).collect()
    assert sum(r["n_orders"] for r in rows) > 0
    quadrant = 1 << (ZORDER_BITS - 3)  # 2^10 per dim at 6 coarse bits
    for r in rows:
        assert r["max_day"] - r["min_day"] < quadrant, r
        assert r["max_price_c"] - r["min_price_c"] < quadrant, r


def _file_spans(path: str, col: str) -> list[tuple]:
    spans = []
    files = sorted(
        glob.glob(f"{path}/*.parquet") + glob.glob(f"{path}/*/*.parquet")
    )
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = schema_idx[col]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
    return spans


def test_zordered_files_bound_both_dims_where_single_sort_does_not(
    spark, tmp_path
):
    orders = load_tables(spark, SF)["orders"].select(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')"
        ).alias("da"),
        F.expr("CAST(floor(o_totalprice) AS BIGINT) DIV 100").alias("db"),
    )
    lo_a, hi_a, lo_b, hi_b = orders.agg(
        F.min("da"), F.max("da"), F.min("db"), F.max("db")
    ).first()
    span_a, span_b = hi_a - lo_a, hi_b - lo_b

    zdir = str(tmp_path / "zorder")
    zorder_write(orders, F.col("da"), F.col("db"), zdir)
    ddir = str(tmp_path / "datesort")
    (
        orders.repartitionByRange(8, "da")
        .sortWithinPartitions("da")
        .write.mode("overwrite")
        .parquet(ddir)
    )

    def worst_frac(path):
        fa = [(hi - lo) / span_a for lo, hi in _file_spans(path, "da")]
        fb = [(hi - lo) / span_b for lo, hi in _file_spans(path, "db")]
        return max(max(a, b) for a, b in zip(fa, fb))

    z_worst = worst_frac(zdir)
    d_worst = worst_frac(ddir)
    # Z-order: every file's WORST dimension stays a fraction of the
    # space; date-sort leaves price effectively unbounded per file
    assert z_worst <= 0.55, z_worst
    assert d_worst >= 0.8, d_worst
    # both dims individually bounded per z file
    for lo, hi in _file_spans(zdir, "db"):
        assert (hi - lo) / span_b <= 0.55
