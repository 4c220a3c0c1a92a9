#!/usr/bin/env python3
"""Build the hot-cluster embeddings twin for the ANN/embedding skew
A/B (SCALING.md "Round 17 — adversarial skew", embeddings extension):
target/emb_skew/ mirrors sf0.1 (all tables symlinked) except
embeddings.parquet, which keeps vectors 1000-1999 unchanged and
replaces vectors 0-999 with a DUP-HEAVY HOT REGION: 25 base vectors
(originals 0-24) each replicated 40x under a tiny deterministic
jitter (~1e-3 per dim, far inside the 0.3 near-dup threshold), so 50%
of the corpus collapses into 25 near-identical balls — the hot-cell /
hot-bucket case for IVF assignment, cell-blocked pair generation, and
k-NN cell probing.

Same row count as sf0.1 (2000 x 64 float32), so the existing
BASELINE_duckdb numbers are the uniform control.

Usage: python3 scripts/make_skew_emb.py [sf_dir]

(Dev-loop tool, driver-side python; the engine itself is pure
Scala/Spark.)
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = "target/emb_skew"
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{sfdir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = [r[0] for r in rows]
    embs = np.array([r[1] for r in rows], dtype=np.float32)
    labels = [r[2] for r in rows]
    n, dim = embs.shape
    assert n == 2000 and dim == 64, (n, dim)
    rng = np.random.default_rng(17)
    out_emb = embs.copy()
    out_label = list(labels)
    # vectors 0-999 become 25 hot balls of 40 jittered copies each;
    # the ball center is original vector (slot % 25), its label rides
    for slot in range(1000):
        base = slot % 25
        out_emb[slot] = embs[base] + rng.normal(0, 1e-3, dim).astype(np.float32)
        out_label[slot] = labels[base]
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in out_emb],
                              pa.list_(pa.float32())),
        "label": pa.array(out_label, pa.int32()),
    })
    pq.write_table(tbl, f"{outdir}/embeddings.parquet")
    for t in TABLES:
        dst = f"{outdir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{sfdir}/{t}.parquet", dst)
    chk = duckdb.connect().execute(f"""
        SELECT count(*), len(embedding), count(DISTINCT label)
        FROM '{outdir}/embeddings.parquet' GROUP BY 2""").fetchall()
    print(f"emb_skew at {outdir}: {chk}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
