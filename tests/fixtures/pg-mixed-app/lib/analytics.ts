import { prisma } from './prisma';

// cal.com-class shape: ORM aggregate and raw SQL in the SAME service
// module (clone_test_oss_repos.sh:8-22 — mixed prisma + raw repos).

export async function bookingsByStatus() {
  const rows = await prisma.booking.groupBy({
    by: ['status'],
    _count: { id: true },
    _sum: { amount: true },
  });
  return rows;
}

export async function monthlyRevenue() {
  const rows = await prisma.$queryRaw`
    SELECT DATE_TRUNC('month', created_at) AS month,
           SUM(amount) AS revenue,
           COUNT(*) AS bookings
    FROM bookings
    WHERE 1=1
    GROUP BY 1
    ORDER BY 1
  `;
  return rows;
}
