"""MergeTree-DDL layout bridge (r13 — VERDICT r12 missing #3).

``parse_merge_tree_ddl`` reads ``PARTITION BY``/``ORDER BY`` from the
DDL a reference user holds; ``layout_write`` carries them to the lake:
hive partition dirs (partition pruning) + range-repartitioned,
within-sorted files (footer min/max pruning on the leading ORDER BY
key). The data-skipping property is verified against REAL parquet
footers, compared to the unmanaged layout — the ``orders_zorder_profile``
pattern, driven from DDL.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from clickhouse_build_spark.functions.chsql import parse_merge_tree_ddl
from clickhouse_build_spark.plans.layout import ORDERS_MERGETREE_DDL
from clickhouse_build_spark.sources.layout_policy import layout_write

SF = "/root/testdata/sf0.01"


def test_parser_reads_the_canonical_ddl():
    spec = parse_merge_tree_ddl(ORDERS_MERGETREE_DDL)
    assert spec.table == "orders_lake"
    assert spec.order_by == ["o_custkey", "o_orderkey"]
    assert spec.partition_col == "o_orderdate_yyyymm"
    assert "yyyyMM" in spec.partition_spark


def test_parser_fails_loudly_on_unsupported_shapes():
    with pytest.raises(ValueError, match="MergeTree engines only"):
        parse_merge_tree_ddl("CREATE TABLE t (x Int) ENGINE = Log ORDER BY x")
    with pytest.raises(ValueError, match="no ORDER BY"):
        parse_merge_tree_ddl("CREATE TABLE t (x Int) ENGINE = MergeTree()")
    with pytest.raises(ValueError, match="unsupported PARTITION BY"):
        parse_merge_tree_ddl(
            "CREATE TABLE t (x Int) ENGINE = MergeTree "
            "PARTITION BY cityHash64(x) ORDER BY x"
        )
    with pytest.raises(ValueError, match="simple columns"):
        parse_merge_tree_ddl(
            "CREATE TABLE t (x Int) ENGINE = MergeTree "
            "ORDER BY (toDate(x), y)"
        )
    # ReplacingMergeTree and bare-column forms parse
    spec = parse_merge_tree_ddl(
        "CREATE TABLE t (x Int) ENGINE = ReplacingMergeTree(v) "
        "PARTITION BY region ORDER BY x"
    )
    assert spec.order_by == ["x"] and spec.partition_col == "region"


def _file_stats(root: str, col: str) -> list[tuple[str, object, object]]:
    out = []
    for f in sorted(set(glob.glob(f"{root}/**/*.parquet", recursive=True))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((f, lo, hi))
    return out


def test_partitioned_layout_dirs_prune_months(spark, tmp_path):
    spec = parse_merge_tree_ddl(ORDERS_MERGETREE_DDL)
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    out = str(tmp_path / "orders_lake")
    layout_write(orders, spec, out)
    dirs = [d for d in os.listdir(out) if d.startswith(spec.partition_col)]
    assert len(dirs) > 12  # the 7-year horizon yields ~80 month dirs
    # every file under a month dir carries ONLY that month (footer
    # o_orderdate min/max stay inside it) — directory pruning is sound
    for d in dirs[:6] + dirs[-2:]:
        month = d.split("=")[1]
        for f, lo, hi in _file_stats(os.path.join(out, d), "o_orderdate"):
            assert lo.strftime("%Y%m") == month, (f, lo)
            assert hi.strftime("%Y%m") == month, (f, hi)


def test_sorted_ranges_bound_leading_key_where_unmanaged_does_not(
    spark, tmp_path
):
    # Unpartitioned MergeTree DDL: ORDER BY only -> range-split sorted
    # files with narrow, pairwise-disjoint leading-key spans.
    spec = parse_merge_tree_ddl(
        "CREATE TABLE orders_sorted (x Int) ENGINE = MergeTree() "
        "ORDER BY (o_custkey, o_orderkey)"
    )
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    managed = str(tmp_path / "managed")
    unmanaged = str(tmp_path / "unmanaged")
    layout_write(orders, spec, managed, n_files=8)
    # unmanaged: the default layout a plain snapshot writes — shuffle
    # by nothing in particular, every file spans ~the full key range
    orders.repartition(8).write.mode("overwrite").parquet(unmanaged)

    m = sorted(_file_stats(managed, "o_custkey"), key=lambda t: t[1])
    u = _file_stats(unmanaged, "o_custkey")
    assert len(m) >= 4 and len(u) >= 4
    total = max(hi for _, _, hi in m) - min(lo for _, lo, _ in m)
    # managed: disjoint consecutive spans, each a small slice of the range
    for (_, _, prev_hi), (_, lo, _) in zip(m, m[1:]):
        assert prev_hi <= lo, "managed file spans overlap"
    med_span = sorted(hi - lo for _, lo, hi in m)[len(m) // 2]
    assert med_span < 0.25 * total, (med_span, total)
    # unmanaged: a typical file spans most of the key range
    u_med = sorted(hi - lo for _, lo, hi in u)[len(u) // 2]
    assert u_med > 0.9 * total, (u_med, total)


def test_registered_profile_is_ddl_driven(spark):
    from clickhouse_build_spark.plans import REGISTRY

    rows = (
        REGISTRY["orders_mergetree_layout_profile"].builder(spark, SF).collect()
    )
    spec = parse_merge_tree_ddl(ORDERS_MERGETREE_DDL)
    assert rows and spec.partition_col in rows[0].asDict()
    months = [r[spec.partition_col] for r in rows]
    assert months == sorted(months) and len(months) > 12


# ------------------------------------------------------------- TTL (r14)

TTL_DDL = """
CREATE TABLE orders_lake (
  o_orderkey Int64, o_custkey Int64, o_totalprice Float64,
  o_orderdate Date
) ENGINE = MergeTree()
PARTITION BY toYYYYMM(o_orderdate)
ORDER BY (o_custkey, o_orderkey)
TTL o_orderdate + INTERVAL 3 MONTH DELETE
"""


def test_ttl_clause_parses():
    spec = parse_merge_tree_ddl(TTL_DDL)
    assert spec.ttl_col == "o_orderdate"
    assert spec.ttl_value == 3 and spec.ttl_unit == "MONTH"
    assert spec.partition_func == "toyyyymm"
    assert spec.partition_src == "o_orderdate"


def test_ttl_unsupported_shapes_fail_loudly():
    base = (
        "CREATE TABLE t (x Int, d Date) ENGINE = MergeTree "
        "PARTITION BY toYYYYMM(d) ORDER BY x "
    )
    for ttl in [
        "TTL d + INTERVAL 1 MONTH TO DISK 'cold'",   # tiering
        "TTL d + INTERVAL 1 MONTH WHERE x = 0",       # conditional
        "TTL toStartOfDay(d) + INTERVAL 1 DAY",       # expression base
        "TTL d + INTERVAL 1 MONTH, x + INTERVAL 1 DAY",  # multiple
    ]:
        with pytest.raises(ValueError, match="unsupported TTL clause"):
            parse_merge_tree_ddl(base + ttl)
    # the plain layout DDL (no TTL) keeps parsing with empty TTL fields
    spec = parse_merge_tree_ddl(base)
    assert spec.ttl_col is None


def test_expire_drops_only_fully_expired_partitions(spark, tmp_path):
    """`maintenance expire`: partitions whose WHOLE span is past the
    TTL horizon drop (directory unlink); every surviving partition's
    parquet files are byte-untouched — never a rewrite (CH's
    ttl_only_drop_parts discipline)."""
    from clickhouse_build_spark.sources.maintenance import expire_partitions

    spec = parse_merge_tree_ddl(TTL_DDL)
    out = str(tmp_path / "orders_lake")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    layout_write(df, spec, out)
    before = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for f in glob.glob(f"{out}/**/*.parquet", recursive=True)
    }
    months = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out)
        if d.startswith("o_orderdate_yyyymm=")
    )
    # as-of 1998-01-01 with +3 MONTH: a month M expires iff
    # last_day(M) + 3 months < 1998-01-01, i.e. M <= 1997-09
    report = expire_partitions(out, spec, "1998-01-01")
    want_dropped = [str(m) for m in months if m <= 199709]
    want_kept = [str(m) for m in months if m > 199709]
    assert report["dropped_partitions"] == want_dropped
    assert report["kept_partitions"] == want_kept
    assert want_dropped and want_kept  # the fixture spans the boundary
    # boundary month 199710 survives: its span end + 3mo = 1998-01-31
    assert "199710" in report["kept_partitions"]
    # survivors byte-untouched
    after = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for f in glob.glob(f"{out}/**/*.parquet", recursive=True)
    }
    assert after == {
        f: st for f, st in before.items() if os.path.exists(f)
    }
    # the table now reads as exactly the post-horizon rows
    kept_rows = spark.read.parquet(out).count()
    want_rows = df.filter("o_orderdate >= DATE '1997-10-01'").count()
    assert kept_rows == want_rows
    # idempotent: a second pass drops nothing
    again = expire_partitions(out, spec, "1998-01-01")
    assert again["dropped_partitions"] == []


def test_expire_guards_fail_loudly(spark, tmp_path):
    from clickhouse_build_spark.sources.maintenance import expire_partitions

    # TTL column != PARTITION BY source — pruning would be unsound
    bad = parse_merge_tree_ddl(
        "CREATE TABLE t (x Int, d Date, u Date) ENGINE = MergeTree "
        "PARTITION BY toYYYYMM(d) ORDER BY x "
        "TTL u + INTERVAL 1 MONTH"
    )
    with pytest.raises(ValueError, match="not the PARTITION BY source"):
        expire_partitions(str(tmp_path), bad, "2024-01-01")
    # identity (non-time) partition value has no known span
    ident = parse_merge_tree_ddl(
        "CREATE TABLE t (x Int, d Date) ENGINE = MergeTree "
        "PARTITION BY d ORDER BY x TTL d + INTERVAL 1 MONTH"
    )
    p = tmp_path / "t" / "d=2024-01-01"
    p.mkdir(parents=True)
    with pytest.raises(ValueError, match="no known span"):
        expire_partitions(str(tmp_path / "t"), ident, "2024-06-01")
    # no TTL declared
    plain = parse_merge_tree_ddl(
        "CREATE TABLE t (x Int, d Date) ENGINE = MergeTree "
        "PARTITION BY toYYYYMM(d) ORDER BY x"
    )
    with pytest.raises(ValueError, match="no table-level TTL"):
        expire_partitions(str(tmp_path), plain, "2024-01-01")


def test_expire_cli_roundtrip(spark, tmp_path, capsys):
    """`maintenance expire` end-to-end through the CLI entrypoint —
    no SparkSession is created for it (pure directory math)."""
    import json

    from clickhouse_build_spark.__main__ import main

    spec = parse_merge_tree_ddl(TTL_DDL)
    out = str(tmp_path / "orders_lake")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    layout_write(df, spec, out)
    rc = main(
        ["maintenance", "expire", out, "--ddl", TTL_DDL, "--as-of", "1998-01-01"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["action"] == "expire"
    assert rep["dropped_partitions"] and rep["kept_partitions"]
