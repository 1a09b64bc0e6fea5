import { dataSource } from '../lib/datasource';
import { Expense } from '../entities/expense';

// TypeORM query-builder with the table named IN the chain: fully
// translatable (select/addSelect raw-SQL expressions pass through).
export async function categoryTotals() {
  const rows = await dataSource
    .createQueryBuilder()
    .from('expenses', 'e')
    .select('e.category', 'category')
    .addSelect('SUM(e.amount)', 'total')
    .addSelect('COUNT(*)', 'cnt')
    .groupBy('e.category')
    .orderBy('total', 'DESC')
    .getRawMany();
  return rows;
}

// Repository-scoped builder: the entity's table name lives in the
// @Entity decorator, NOT in this chain — the scanner must still find
// the aggregate site, and emit must fail loudly rather than guess.
export async function monthlyAverage() {
  const repo = dataSource.getRepository(Expense);
  const rows = await repo
    .createQueryBuilder('expense')
    .select("DATE_TRUNC('month', expense.date)", 'month')
    .addSelect('AVG(expense.amount)', 'avg_amount')
    .groupBy("DATE_TRUNC('month', expense.date)")
    .orderBy('month', 'ASC')
    .getRawMany();
  return rows;
}

// TypeORM :param markers bound from a LITERAL parameters object are
// spliced at scan time (r16) — dynamic binds stay loud.
export async function bigCategoryTotals() {
  const rows = await dataSource
    .createQueryBuilder()
    .from('expenses', 'e')
    .select('e.category', 'category')
    .addSelect('SUM(e.amount)', 'total')
    .where('e.amount >= :minAmount', { minAmount: 25 })
    .groupBy('e.category')
    .orderBy('total', 'DESC')
    .getRawMany();
  return rows;
}
