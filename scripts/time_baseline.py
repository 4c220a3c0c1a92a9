#!/usr/bin/env python3
"""Re-time the CURRENT oracle SQL set in DuckDB against an sf dir and
write BASELINE_duckdb.json {query: median_sec} — the per-query numeric
proxy baseline that Bench divides by to report ratios.

Usage: python3 scripts/time_baseline.py <verify_outdir> <sf_dir> [reps]

(Dev-loop tool, driver-side python; re-run whenever a query's oracle
SQL changes so the 2x gate always compares same-definition work.)
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    out = {}
    for name in sorted(oracle):
        times = []
        for _ in range(reps):
            con = duckdb.connect()  # cold connection per rep, like Bench's clearCache
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            times.append(time.perf_counter() - t0)
            con.close()
        out[name] = round(statistics.median(times), 3)
        print(f"{name}: {out[name]}")
    with open("BASELINE_duckdb.json", "w") as f:
        json.dump({"sf_dir": sfdir, "reps": reps, "queries": out}, f, indent=1)
    print(f"total {round(sum(out.values()), 3)} s over {len(out)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
