import { prisma } from '../../lib/prisma';

export async function recordClick(linkId: number) {
  await prisma.$executeRaw`
    INSERT INTO click_events (link_id, ts) VALUES (${linkId}, now())
  `;
}

export async function getBooking(id: number) {
  return prisma.booking.findUnique({ where: { id } });
}
