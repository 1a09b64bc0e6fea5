import { NextResponse } from 'next/server';
import { getCategoryInsights, getMonthlyTrend } from '../../../services/insights';

// Thin route: every query lives in the service layer (cal.com-style
// separation). This file must contribute ZERO scanned queries.
export async function GET() {
  const categories = await getCategoryInsights();
  const trend = await getMonthlyTrend();
  return NextResponse.json({ categories, trend });
}
