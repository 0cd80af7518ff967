#!/usr/bin/env python3
"""Cross-copy shared-shingle audit for ScaleData derivatives.

Counts word-3-gram shingles (Hashing.words semantics: split on
[ \\t\\n\\f\\r]+, drop empties, case-preserving) that appear in MORE THAN
ONE copy class (copy = doc_id // 10^12) of a scaled documents table.
The generator's goal is zero cross-copy shingles: any shared shingle is
a planted near-dup candidate that biases text-dedup scale exponents
upward (the r12/r13 aliasing findings in BASELINE.md).

Usage: python3 tools/shingle_audit.py <scaledata_dir> [n]
"""
import sys

import duckdb

d = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
con = duckdb.connect()
con.sql("SET enable_progress_bar=false")
gram = " || ' ' || ".join(f"w[CAST(gs AS INT)+{i}]" for i in range(n))
q = f"""
WITH docs AS (
  SELECT doc_id // 1000000000000 AS copy,
         string_split_regex(trim(text), '[ \t\n\f\r]+') AS w
  FROM read_parquet('{d}/documents.parquet/*.parquet')
  WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT copy, s
  FROM (
    SELECT copy, {gram} AS s
    FROM (SELECT copy, w, unnest(generate_series(1, len(w)-{n - 1})) AS gs
          FROM docs WHERE len(w) >= {n})
  )
),
agg AS (SELECT s, count(DISTINCT copy) AS n_copies FROM sh GROUP BY s)
SELECT count(*) AS distinct_shingles,
       count(*) FILTER (WHERE n_copies > 1) AS cross_copy_shingles,
       max(n_copies) AS max_copies
FROM agg
"""
print(con.sql(q).df().to_string(index=False))
ex = con.sql(
    f"""
WITH docs AS (
  SELECT doc_id // 1000000000000 AS copy,
         string_split_regex(trim(text), '[ \t\n\f\r]+') AS w
  FROM read_parquet('{d}/documents.parquet/*.parquet')
  WHERE text IS NOT NULL
),
sh AS (
  SELECT DISTINCT copy, s
  FROM (
    SELECT copy, {gram} AS s
    FROM (SELECT copy, w, unnest(generate_series(1, len(w)-{n - 1})) AS gs
          FROM docs WHERE len(w) >= {n})
  )
)
SELECT s, count(DISTINCT copy) AS n_copies,
       list(DISTINCT copy ORDER BY copy)[1:6] AS sample_copies
FROM sh GROUP BY s HAVING count(DISTINCT copy) > 1
ORDER BY n_copies DESC, s LIMIT 10
"""
).df()
if len(ex):
    print("\nexamples (top cross-copy shingles):")
    print(ex.to_string(index=False))
