#!/usr/bin/env python3
"""Build the hot-key events twins for the time-series/as-of skew A/B
(SCALING.md "Round 17 — adversarial skew", events extension):

  - target/events_uni10:  10 id-shifted replicas of sf0.1 events with
    DISTINCT user ids per replica (15k users, 1M rows) — the uniform
    10x control.
  - target/events_skew10: the same 1M rows, but replicas 5-9 are
    remapped to user_id = 0 — ONE user owns 50% of all events
    (500k rows, ~0.5 s spacing across the month), the adversarial
    case for every Window.partitionBy(user_id) in the family
    (sessionize, gaps, as-of): a single giant partition on one task.

Other tables are symlinked from the sf dir so graft.Bench and the
DuckDB twin read one directory.

Usage: python3 scripts/make_skew_events.py [sf_dir]

(Dev-loop tool, driver-side python; the engine itself is pure
Scala/Spark.)
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def build(con, sfdir, outdir, hot):
    os.makedirs(outdir, exist_ok=True)
    n = con.execute("SELECT max(event_id) + 1 FROM e").fetchone()[0]
    u = con.execute("SELECT max(user_id) + 1 FROM e").fetchone()[0]
    user_expr = ("CASE WHEN k >= 5 THEN 0 ELSE user_id + k * {u} END"
                 if hot else "user_id + k * {u}").format(u=u)
    con.execute(f"""
        COPY (
          SELECT event_id + k * {n} AS event_id, ts,
                 {user_expr} AS user_id, event_type, value, props
          FROM e CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS k)
          ORDER BY event_id
        ) TO '{outdir}/events.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        dst = f"{outdir}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(f"{sfdir}/{t}.parquet", dst)
    stats = duckdb.connect().execute(f"""
        SELECT count(*), count(DISTINCT user_id),
               sum(CASE WHEN user_id = 0 THEN 1 ELSE 0 END)
        FROM '{outdir}/events.parquet'""").fetchone()
    print(f"{outdir}: {stats[0]} events, {stats[1]} users, "
          f"{stats[2]} on user 0 ({100.0 * stats[2] / stats[0]:.1f}%)")


def main() -> int:
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW e AS SELECT * FROM '{sfdir}/events.parquet'")
    build(con, sfdir, "target/events_uni10", hot=False)
    build(con, sfdir, "target/events_skew10", hot=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
