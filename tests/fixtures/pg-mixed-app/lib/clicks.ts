import { sql } from './db';

// dub-class shape: bare tagged-template raw SQL rollups.

export async function topLinks() {
  const rows = await sql`
    SELECT link_id, COUNT(*) AS clicks
    FROM click_events
    WHERE 1=1
    GROUP BY link_id
    ORDER BY clicks DESC
    LIMIT 10
  `;
  return rows;
}

export async function clickShare() {
  const rows = await sql`
    SELECT link_id,
           COUNT(*) AS clicks,
           COUNT(*) * 100.0 / SUM(COUNT(*)) OVER () AS pct
    FROM click_events
    WHERE 1=1
    GROUP BY link_id
  `;
  return rows;
}
