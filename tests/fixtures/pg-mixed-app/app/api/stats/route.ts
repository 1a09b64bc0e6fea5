import { bookingsByStatus, monthlyRevenue } from '../../../lib/analytics';

export async function GET() {
  const byStatus = await bookingsByStatus();
  const monthly = await monthlyRevenue();
  return Response.json({ byStatus, monthly });
}
