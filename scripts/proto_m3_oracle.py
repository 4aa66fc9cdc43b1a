#!/usr/bin/env python3
"""Prototype the m3 DuckDB oracle (byte-class histogram of UTF-8 text)
against a direct Python reimplementation of the Spark stub."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
docs = f"/root/testdata/{sf}/documents.parquet"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

FEATURE_DIM = 16
sql = f"""
WITH b AS (
  SELECT doc_id AS id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents),
bytes AS (
  SELECT id, CAST(('0x' || substr(hx, 2*p+1, 2)) AS INT) % {FEATURE_DIM} AS bucket
  FROM (SELECT id, hx, unnest(generate_series(0, n-1)) AS p FROM b)),
cnt AS (SELECT id, bucket, count(*) AS c FROM bytes GROUP BY 1, 2),
dims AS (SELECT unnest(generate_series(0, {FEATURE_DIM-1})) AS dim)
SELECT b.id, b.modality, CAST(d.dim AS INT) AS dim,
       coalesce(c.c, 0) / CAST(greatest(b.n, 1) AS DOUBLE) AS feat
FROM b CROSS JOIN dims d
LEFT JOIN cnt c ON c.id = b.id AND c.bucket = d.dim
ORDER BY 1, 3
"""
rows = con.execute(sql).fetchall()

# python twin of the (un-rounded) Spark stub
py = {}
for doc_id, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
    bs = text.encode("utf-8")
    hist = [0.0] * FEATURE_DIM
    for by in bs:
        hist[(by & 0xFF) % FEATURE_DIM] += 1
    total = max(len(bs), 1)
    py[doc_id] = [h / total for h in hist]

bad = 0
for (i, mod, dim, feat) in rows:
    exp = py[i][dim]
    if feat != exp:
        bad += 1
        if bad < 5:
            print("MISMATCH", i, dim, feat, exp)
print(f"rows={len(rows)} docs={len(py)} mismatches={bad}")
assert bad == 0 and len(rows) == len(py) * FEATURE_DIM
print("m3 oracle OK")
