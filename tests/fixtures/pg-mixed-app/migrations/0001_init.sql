CREATE TABLE bookings (
  id BIGINT PRIMARY KEY,
  status TEXT,
  amount DOUBLE PRECISION,
  created_at TIMESTAMP
);

CREATE TABLE click_events (
  link_id BIGINT,
  ts TIMESTAMP
);
