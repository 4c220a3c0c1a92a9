#!/usr/bin/env python3
"""Build the ADVERSARIAL-SKEW twin of the scale10 corpus (SCALING.md
"Round 17 — adversarial skew"): same order of magnitude as scale10
(~50k docs) but deliberately hostile to hash-partitioned dedup /
curation work:

  - HOT DOMAIN: one source ('src0') owns ~50% of all rows;
  - DUPLICATE-HEAVY: the hot domain is 100 near-identical replicas of
    only 250 distinct texts, so content-hash groups, LSH band buckets,
    and shingle posting lists all concentrate on a few hot keys;
  - GIANT DOCS: 50 documents ~100x the average length (concatenations
    of corpus texts) under the hot source, stressing per-doc O(tokens)
    kernels (substring spans, repetition stats, token gates).

Layout at out_dir mirrors scale10: documents.parquet materialized,
lineitem replicated 10x (so any fixture-joined row still runs), the
rest symlinked to the sf dir.

Usage: python3 scripts/make_skew10.py [sf_dir] [out_dir]

(Dev-loop tool, driver-side python; the engine itself is pure
Scala/Spark.)
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "events", "embeddings"]


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/skew10"
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM '{sfdir}/documents.parquet'")
    # stride = max+1, same rationale as make_scale10.py
    n = con.execute("SELECT max(doc_id) + 1 FROM d").fetchone()[0]
    # background: 5 full replicas of the whole corpus (25k rows, the
    # uniform component); hot domain: 95 EXTRA replicas of src0's 250
    # docs (23,750 rows -> src0 ends at 100 copies of each text);
    # giants: 50 docs, each the concatenation of ~100 corpus texts
    # (~30k chars vs the 297-char average), hot-source, one per lang
    # round-robin. Giant ids sit above every replica id.
    con.execute(f"""
        COPY (
          WITH background AS (
            SELECT doc_id + k * {n} AS doc_id, text, lang, source, n_chars
            FROM d CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS k)
          ), hot AS (
            SELECT doc_id + (k + 5) * {n} AS doc_id, text, lang, source, n_chars
            FROM d CROSS JOIN (SELECT unnest(generate_series(0, 94)) AS k)
            WHERE source = 'src0'
          ), giants AS (
            SELECT
              (100 * {n} + g) AS doc_id,
              string_agg(text, ' ' ORDER BY doc_id) AS text,
              ['en', 'de', 'es', 'fr', 'zh'][(g % 5) + 1] AS lang,
              'src0' AS source,
              length(string_agg(text, ' ' ORDER BY doc_id)) AS n_chars
            FROM (SELECT *, doc_id % 50 AS g FROM d)
            GROUP BY g
          )
          SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
                 CAST(lang AS VARCHAR) AS lang,
                 CAST(source AS VARCHAR) AS source,
                 CAST(n_chars AS BIGINT) AS n_chars
          FROM (
            SELECT * FROM background
            UNION ALL SELECT * FROM hot
            UNION ALL SELECT * FROM giants
          )
          ORDER BY doc_id
        ) TO '{outdir}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(
        f"CREATE VIEW li AS SELECT * FROM '{sfdir}/lineitem.parquet'")
    cols = [r[0] for r in con.execute("DESCRIBE li").fetchall()]
    rest = ", ".join(c for c in cols if c != "l_orderkey")
    maxo = con.execute("SELECT max(l_orderkey) + 1 FROM li").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT l_orderkey + k * {maxo} AS l_orderkey, {rest}
          FROM li CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k)
          ORDER BY l_orderkey, l_linenumber
        ) TO '{outdir}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        dst = f"{outdir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{sfdir}/{t}.parquet", dst)
    stats = duckdb.connect().execute(f"""
        SELECT count(*),
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END),
               max(n_chars),
               count(*) - count(DISTINCT text)
        FROM '{outdir}/documents.parquet'""").fetchone()
    print(f"skew10 at {outdir}: {stats[0]} docs, "
          f"{stats[1]} hot-source ({100.0 * stats[1] / stats[0]:.1f}%), "
          f"max n_chars {stats[2]}, {stats[3]} duplicate rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
