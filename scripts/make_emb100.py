#!/usr/bin/env python3
"""Rebuild the 100x replica EMBEDDING corpus used by SCALING.md
"Round 18 (cont.) — the embedding family under 100x vector copies":
`replicas` id-shifted copies of every sf embedding at out_dir
(default target/emb100), with every other table symlinked so
graft.Bench and DuckDB twins read one directory. Models a duplicated
crawl that was embedded: duplicate texts produce duplicate vectors.

Usage: python3 scripts/make_emb100.py [sf_dir] [out_dir] [replicas]

(Dev-loop tool, driver-side python; the engine itself is pure
Scala/Spark.)
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "target/emb100"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW e AS SELECT * FROM '{sfdir}/embeddings.parquet'")
    # stride = max(vec_id)+1, NOT count(*): a non-dense id domain with
    # a count stride would collide replica ids (same rationale as
    # make_scale10.py's documents stride)
    n = con.execute("SELECT max(vec_id) + 1 FROM e").fetchone()[0]
    cols = [r[0] for r in con.execute("DESCRIBE e").fetchall()]
    rest = ", ".join(c for c in cols if c != "vec_id")
    con.execute(f"""
        COPY (
          SELECT vec_id + k * {n} AS vec_id, {rest}
          FROM e CROSS JOIN (SELECT unnest(generate_series(0, {replicas - 1})) AS k)
          ORDER BY vec_id
        ) TO '{outdir}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        dst = f"{outdir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{sfdir}/{t}.parquet", dst)
    rows = duckdb.connect().execute(
        f"SELECT count(*) FROM '{outdir}/embeddings.parquet'").fetchone()[0]
    print(f"{outdir}/embeddings.parquet: {rows} rows ({replicas}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
