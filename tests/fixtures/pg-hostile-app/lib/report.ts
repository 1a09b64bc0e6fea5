import { db } from './db';
import { expenses } from './schema';
import { count, sum } from 'drizzle-orm';

// builder call split across helpers: the base chain is assembled here,
// the grouping is applied by a helper below
const base = db
  .select({ category: expenses.category, count: count(), total: sum(expenses.amount) })
  .from(expenses);

export async function categoryTotals() {
  return withGrouping(base);
}

function withGrouping(q: unknown) {
  return (q as { groupBy: (c: unknown) => unknown }).groupBy(expenses.category);
}
