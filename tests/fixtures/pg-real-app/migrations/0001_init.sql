-- migrations are EXCLUDED by directory rule even when they carry
-- aggregate-looking SQL (reference ground truth counts app queries only)
CREATE TABLE expenses (
  id SERIAL PRIMARY KEY,
  amount DECIMAL(10,2) NOT NULL,
  category VARCHAR(100),
  category_id INT,
  date DATE NOT NULL
);

CREATE VIEW migration_only_rollup AS
SELECT category, COUNT(*) AS n FROM expenses GROUP BY category;

INSERT INTO expenses (amount, category, category_id, date)
SELECT 1.0, 'seed', 1, CURRENT_DATE;
