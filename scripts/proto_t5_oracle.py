#!/usr/bin/env python3
"""Prototype the t5 DuckDB winnowing oracle against a Python port of
graft.functions.WinnowKernel (k=8, w=5, base 257, mod 2^61-1)."""
import duckdb, hashlib, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
docs = f"/root/testdata/{sf}/documents.parquet"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

K, W = 8, 5
BASE = 257
MOD = (1 << 61) - 1
POWS = [pow(BASE, K - 1 - j, MOD) for j in range(K)]  # weight of byte j in gram

pow_values = ", ".join(f"({j}, {POWS[j]}::HUGEINT)" for j in range(K))
sql = f"""
WITH d AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents),
b AS (
  SELECT doc_id, p, CAST(('0x' || substr(hx, 2*p+1, 2)) AS INT) AS bv, nb - {K} + 1 AS ng
  FROM (SELECT doc_id, hx, nb, unnest(generate_series(0, nb-1)) AS p FROM d)),
hs AS (
  SELECT doc_id, p - j AS pos, max(ng) AS ng,
         CAST(sum(CAST(bv AS HUGEINT) * powj) % {MOD} AS BIGINT) AS h
  FROM b JOIN (VALUES {pow_values}) AS wts(j, powj) ON p - j BETWEEN 0 AND ng - 1
  GROUP BY 1, 2),
win AS (
  SELECT doc_id, pos AS start, ng,
         min(CAST(h AS HUGEINT) * 4294967296 + (4294967295 - pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {W-1} FOLLOWING) AS combo
  FROM hs WHERE ng > {W}
  QUALIFY start <= ng - {W}),
sel AS (
  SELECT doc_id, start,
         CAST(combo // 4294967296 AS BIGINT) AS fph,
         4294967295 - CAST(combo % 4294967296 AS BIGINT) AS minidx
  FROM win),
emitted AS (
  SELECT doc_id, start, fph
  FROM (SELECT *, lag(minidx) OVER (PARTITION BY doc_id ORDER BY start) AS previdx FROM sel)
  WHERE previdx IS NULL OR minidx <> previdx),
short AS (
  SELECT doc_id, 0 AS start, min(h) AS fph
  FROM hs WHERE ng BETWEEN 1 AND {W}
  GROUP BY doc_id),
fp AS (SELECT * FROM emitted UNION ALL SELECT * FROM short),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_fp,
         md5(string_agg(CAST(fph AS VARCHAR), ',' ORDER BY start)) AS fp_md5
  FROM fp GROUP BY doc_id)
SELECT d0.doc_id, coalesce(a.n_fp, 0) AS n_fp, coalesce(a.fp_md5, md5('')) AS fp_md5
FROM documents d0 LEFT JOIN agg a ON d0.doc_id = a.doc_id
ORDER BY 1
"""
rows = con.execute(sql).fetchall()


def winnow(text: str):
    bs = text.encode("utf-8")
    n = len(bs) - K + 1
    if n <= 0:
        return []
    hs = []
    for i in range(n):
        h = 0
        for j in range(K):
            h = (h * BASE + bs[i + j]) % MOD
        hs.append(h)
    if n <= W:
        return [min(hs)]
    out, last = [], -1
    for start in range(0, n - W + 1):
        mi = start
        for j in range(start + 1, start + W):
            if hs[j] <= hs[mi]:
                mi = j
        if mi != last:
            out.append(hs[mi])
            last = mi
    return out


py = {}
for doc_id, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
    fps = winnow(text)
    py[doc_id] = (len(fps), hashlib.md5(",".join(str(f) for f in fps).encode()).hexdigest())

bad = 0
for (i, n_fp, fp_md5) in rows:
    en, eh = py[i]
    if (n_fp, fp_md5) != (en, eh):
        bad += 1
        if bad < 5:
            print("MISMATCH", i, (n_fp, fp_md5), (en, eh))
print(f"rows={len(rows)} docs={len(py)} mismatches={bad}")
assert bad == 0 and len(rows) == len(py)
print("t5 oracle OK")
