import knex from './knex';

// knex legacy report: chain head carries the table name.
export async function dailySpend() {
  return knex('expenses')
    .select(knex.raw("DATE_TRUNC('day', date) AS day"))
    .sum('amount as total')
    .groupBy('day')
    .orderBy('day');
}

// knex object-where: AND of literal equalities (r16).
export async function foodDailySpend() {
  return knex('expenses')
    .select(knex.raw("DATE_TRUNC('day', date) AS day"))
    .sum('amount as total')
    .where({ category: 'Food' })
    .groupBy('day')
    .orderBy('day');
}
