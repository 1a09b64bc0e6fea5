import { prisma } from '../lib/prisma';

// Service-layer ORM aggregate with inline args: fully translatable.
export async function getCategoryInsights() {
  const byCategory = await prisma.expense.groupBy({
    by: ['category'],
    _count: true,
    _sum: { amount: true },
    orderBy: { _sum: { amount: 'desc' } },
  });
  return byCategory;
}

// Options object built away from the call site: the scanner still
// finds the aggregate call, but no deterministic emitter can see the
// grouping — emit must fail loudly, never guess.
const trendOpts = {
  by: ['month'],
  _count: true,
};

export async function getMonthlyTrend() {
  return prisma.expenseMonthly.groupBy(trendOpts);
}
