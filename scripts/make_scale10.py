#!/usr/bin/env python3
"""Rebuild the 10x scale-growth corpus used by SCALING.md "Round 15 —
the scale-growth run": ten id-shifted replicas of sf0.1
documents AND lineitem (the selective-search family's fixture source)
at target/scale10/, with the other tables symlinked so graft.Bench
and the DuckDB twin read one directory.

Usage: python3 scripts/make_scale10.py [sf_dir] [out_dir] [replicas]

`replicas` (default 10) sets the blow-up factor — e.g. 30 builds the
scale30 corpus for trajectory spot probes.

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
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/scale10"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM '{sfdir}/documents.parquet'")
    # stride = max(doc_id)+1, NOT count(*): if doc_ids were ever not
    # dense 0-based, a count stride would silently collide replica ids
    # and skew the very dedup measurements this corpus exists for
    # (the lineitem path below always used max+1)
    n = con.execute("SELECT max(doc_id) + 1 FROM d").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + k * {n} AS doc_id, text, lang, source, n_chars
          FROM d CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS k)
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
          FROM li CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS k)
          ORDER BY l_orderkey, l_linenumber
        ) TO '{outdir}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        dst = f"{outdir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{sfdir}/{t}.parquet", dst)
    rows = duckdb.connect().execute(
        f"SELECT count(*), max(doc_id) FROM '{outdir}/documents.parquet'"
    ).fetchone()
    print(f"scale10 at {outdir}: {rows[0]} docs, max id {rows[1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
