#!/usr/bin/env python3
"""Prototype the m4 DuckDB oracle (nearest-neighbor 2-D resize of the
seeded synthetic rasters) against a direct Python reimplementation of
the Spark kernels (RasterKernel.gen / RasterKernel.resizeNn).

The Python twin builds the FULL source raster and gathers through the
NN index map — the oracle SQL never materializes the source, it
regenerates only the 64 sampled pixels — so agreement here checks the
index math, not a shared shortcut.
"""
import duckdb, hashlib, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
docs = f"/root/testdata/{sf}/documents.parquet"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")

THUMB_W, THUMB_H = 8, 8

sql = f"""
WITH b AS (
  SELECT doc_id AS id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         CAST(doc_id % 25 + 8 AS INT) AS w,
         CAST((doc_id * 7) % 25 + 8 AS INT) AS h
  FROM documents),
px AS (
  SELECT id, modality, w, h, oy, ox,
         (id * 31 + ((oy * h) // {THUMB_H}) * 7 + ((ox * w) // {THUMB_W}) * 13) % 256 AS pix
  FROM b,
       (SELECT unnest(generate_series(0, {THUMB_H - 1})) AS oy),
       (SELECT unnest(generate_series(0, {THUMB_W - 1})) AS ox))
SELECT id, modality, w, h, w * h AS orig_bytes,
       CAST(count(*) AS INT) AS resized_bytes,
       md5(string_agg(printf('%02x', pix), '' ORDER BY oy, ox)) AS resized_md5,
       CAST(max(CASE WHEN oy = 0 AND ox = 0 THEN pix END) AS INT) AS p_first,
       CAST(max(CASE WHEN oy = {THUMB_H - 1} AND ox = {THUMB_W - 1} THEN pix END) AS INT) AS p_last
FROM px GROUP BY 1, 2, 3, 4
ORDER BY 1
"""
rows = con.execute(sql).fetchall()


def gen(doc_id, w, h):
    return bytes(((doc_id * 31 + y * 7 + x * 13) % 256)
                 for y in range(h) for x in range(w))


def resize_nn(raster, w, h, ow, oh):
    return bytes(raster[(oy * h // oh) * w + (ox * w // ow)]
                 for oy in range(oh) for ox in range(ow))


bad = 0
for (doc_id, modality, w, h, orig_bytes, resized_bytes, resized_md5,
     p_first, p_last) in rows:
    raster = gen(doc_id, w, h)
    thumb = resize_nn(raster, w, h, THUMB_W, THUMB_H)
    exp_md5 = hashlib.md5(thumb.hex().encode()).hexdigest()
    ok = (orig_bytes == w * h == len(raster)
          and resized_bytes == len(thumb) == THUMB_W * THUMB_H
          and resized_md5 == exp_md5
          and p_first == thumb[0] and p_last == thumb[-1])
    if not ok:
        bad += 1
        if bad <= 5:
            print(f"MISMATCH id={doc_id} {w}x{h}: sql_md5={resized_md5} "
                  f"py_md5={exp_md5} p_first={p_first}/{thumb[0]} "
                  f"p_last={p_last}/{thumb[-1]}")

print(f"{len(rows)} docs checked, {bad} mismatches "
      f"({'PASS' if bad == 0 else 'FAIL'})")
sys.exit(1 if bad else 0)
