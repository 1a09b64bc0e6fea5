import { db } from './kysely';

// kysely builder: multi-line chain whose head names the table as a
// string ('expenses') and joins a second one ('categories').
export async function categoryReport() {
  const rows = await db
    .selectFrom('expenses')
    .innerJoin('categories', 'categories.id', 'expenses.category_id')
    .select(({ fn }) => [
      'categories.name as category',
      fn.count('expenses.id').as('count'),
      fn.sum('expenses.amount').as('total'),
    ])
    .groupBy('categories.name')
    .orderBy('total', 'desc')
    .execute();
  return rows;
}

// kysely callback .where: the single-expression literal form
// translates (r16); eb.and/eb.or compositions stay runtime concerns.
export async function bigSpendReport() {
  const rows = await db
    .selectFrom('expenses')
    .select(({ fn }) => [
      'expenses.category as category',
      fn.sum('expenses.amount').as('total'),
    ])
    .where((eb) => eb('expenses.amount', '>=', 25))
    .groupBy('expenses.category')
    .orderBy('total', 'desc')
    .execute();
  return rows;
}
