-- analytical view shipped with the app schema (not a migration):
-- the monthly rollup the dashboard reads
CREATE VIEW monthly_spend AS
SELECT DATE_TRUNC('month', date) AS month,
       category,
       COUNT(*) AS n,
       SUM(amount) AS total
FROM expenses
GROUP BY 1, 2;

-- plain DDL: no aggregate signal, must NOT be reported
CREATE TABLE audit_log (
  id SERIAL PRIMARY KEY,
  actor TEXT NOT NULL,
  at TIMESTAMP DEFAULT now()
);

-- saved reporting query (the WHERE 1=1 splice point is the app's own
-- DateFilter convention, same as the golden apps)
SELECT category, COUNT(*) AS count, SUM(amount) AS total
FROM expenses
WHERE 1=1
GROUP BY category
ORDER BY total DESC;
