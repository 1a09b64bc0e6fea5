"""Scanner detector tests — fixtures modeled on the reference's workload
shapes (four stats queries + list + CRUD; FIXTURES.md §1) without copying
reference code."""

from __future__ import annotations

from clickhouse_build_spark.scanner import classify, extract_tables, scan_repo

STATS_TS = """
import { pool } from '@/lib/db';

export async function GET(request) {
  const totals = await pool.query(
    `SELECT COUNT(*) as count, COALESCE(SUM(amount), 0) as total
     FROM expenses WHERE date >= $1`,
    [startDate]
  );
  const byCategory = await pool.query(
    `SELECT COALESCE(category, 'Uncategorized') as category,
            COUNT(*) as count, SUM(amount) as total
     FROM expenses GROUP BY category ORDER BY total DESC`
  );
  const byMonth = await pool.query(
    `SELECT DATE_TRUNC('month', date) as month, COUNT(*) as count
     FROM expenses GROUP BY DATE_TRUNC('month', date) ORDER BY month DESC`
  );
  return Response.json({ totals, byCategory, byMonth });
}
"""

CRUD_TS = """
export async function POST(request) {
  const result = await pool.query(
    `INSERT INTO expenses (description, amount) VALUES ($1, $2) RETURNING *`,
    [description, amount]
  );
  const one = await pool.query(`SELECT * FROM expenses WHERE id = $1`, [id]);
  await pool.query(`DELETE FROM expenses WHERE id = $1`, [id]);
  return Response.json(result.rows[0]);
}
"""

ORM_TS = """
const stats = await prisma.expense.aggregate({
  _count: { id: true },
  _sum: { amount: true },
});
const grouped = await prisma.expense.groupBy({
  by: ['category'],
  _sum: { amount: true },
  orderBy: { _sum: { amount: 'desc' } },
});
"""


def test_classify_aggregates_included():
    ok, reason = classify("SELECT COUNT(*) as count FROM expenses")
    assert ok and "aggregate" in reason


def test_classify_crud_excluded():
    ok, _ = classify("INSERT INTO expenses (a) VALUES ($1)")
    assert not ok
    ok, _ = classify("SELECT * FROM expenses WHERE id = $1")
    assert not ok


def test_classify_window_and_orm():
    ok, r = classify("SELECT rank() OVER (ORDER BY total) FROM t")
    assert ok and "window" in r
    ok, r = classify("prisma.expense.groupBy({ by: ['category'] })")
    assert ok and "orm-aggregate" in r


def test_extract_tables():
    assert extract_tables(
        "SELECT * FROM orders o JOIN lineitem l ON o.id = l.oid"
    ) == ["orders", "lineitem"]


def test_scan_repo_shapes(tmp_path):
    app = tmp_path / "app" / "api"
    app.mkdir(parents=True)
    (app / "stats.ts").write_text(STATS_TS)
    (app / "crud.ts").write_text(CRUD_TS)
    (app / "orm.ts").write_text(ORM_TS)
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "node_modules" / "junk.ts").write_text(STATS_TS)

    result = scan_repo(str(tmp_path))
    # three analytical queries in stats.ts + two ORM aggregates; CRUD and
    # node_modules excluded
    assert result.total_queries == 5
    assert "expenses" in result.tables
    assert result.total_tables == len(result.tables)
    locs = [q.location for q in result.queries]
    assert all(loc.split(":")[0].startswith("app/") for loc in locs)
    assert not any("crud" in loc for loc in locs)
    d = result.to_dict()
    assert set(d) == {"tables", "total_tables", "total_queries", "queries"}


def test_plain_js_from_receivers_are_not_tables():
    """ADVICE r15: `Array.from('abc')` (and friends) inside an included
    snippet must not register a phantom table; the TypeORM string-named
    .from() only counts when the snippet carries a createQueryBuilder
    chain."""
    from clickhouse_build_spark.scanner import extract_tables

    snip = (
        "const chars = Array.from('abc');\n"
        "const buf = Buffer.from('xyz');\n"
        "const r = await ds.createQueryBuilder().from('expenses', 'e')\n"
        "  .select('COUNT(*)', 'n').groupBy('e.category');"
    )
    assert extract_tables(snip) == ["expenses"]
    # no builder chain at all: the quoted .from() is plain JS
    assert extract_tables("const a = Array.from('abc'); sum(a)") == []
