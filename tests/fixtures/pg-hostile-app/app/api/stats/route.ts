import { Pool } from 'pg';
import { prisma, Prisma } from '../../../lib/prisma';

const pool = new Pool();

export async function GET() {
  // two-table JOIN aggregate: per-category totals via the categories dim
  const categoryJoin = await pool.query(`
    SELECT c.name AS category, COUNT(*) AS count, SUM(e.amount) AS total
    FROM expenses e
    JOIN categories c ON c.id = e.category_id
    WHERE 1=1
    GROUP BY c.name
    ORDER BY total DESC
  `);

  // nested template literal composed into $queryRaw
  const monthly = await prisma.$queryRaw`
    SELECT DATE_TRUNC('month', date) AS month, COUNT(*) AS count
    FROM expenses ${Prisma.sql`WHERE amount > 0`}
    GROUP BY month
    ORDER BY month
  `;

  return Response.json({ categoryJoin: categoryJoin.rows, monthly });
}
