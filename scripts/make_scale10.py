"""Generate the key-consistent 10x replication of an sf dir (SURVEY
§7.1's scale-step fixture): every fact/dim table is replicated 10 ways
with per-replica key offsets so foreign keys stay valid inside each
replica; `documents` keeps its TEXT identical across replicas (10-way
near/exact-dup clusters — the stress mode the dedup family documents),
`embeddings` keeps vectors identical (10-way dup vectors), `events`
keeps event times (10x the per-hour density). region/nation are global
dimension vocabularies and are NOT replicated (every replica shares
them), matching the original generator's fixed key space.

Usage: python scripts/make_scale10.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1_x10
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_x10"
REPS = 10

# key column -> offset stride (past the max key in any tested sf).
OFFSETS = {
    "c_custkey": 1_000_000, "s_suppkey": 1_000_000,
    "p_partkey": 10_000_000, "o_orderkey": 100_000_000,
    "o_custkey": 1_000_000, "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000, "l_suppkey": 1_000_000,
    "event_id": 100_000_000, "user_id": 1_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
}

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    src = f"{SRC}/{t}.parquet"
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    if t in ("region", "nation"):
        sel, reps = ", ".join(cols), 1
    else:
        sel = ", ".join(
            f"{c} + r.i * {OFFSETS[c]} AS {c}" if c in OFFSETS else c
            for c in cols)
        reps = REPS
    con.sql(f"""
      COPY (SELECT {sel}
            FROM '{src}' CROSS JOIN (
              SELECT unnest(range(0, {reps})) AS i) r)
      TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n, flush=True)
print("done:", DST)
