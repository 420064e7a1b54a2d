#!/usr/bin/env python3
"""Derive a ~10x (sf1-equivalent) corpus from the read-only sf0.1
testdata by unioning 10 id-remapped replicas (dev tool only — NOT part
of the library; round-10 verdict item #1: the recurring bug class
(q109 half-micro, q57 HUGEINT, q110 decimal cap) only surfaces when
scale changes, so the full oracle gate + bench must run at a scale the
committed gates never see).

Usage: python3 tools/r11/derive.py [outDir]   (default /tmp/sf1d)

SUPERSEDED (round 14): `graft.ScaleCorpus` is the single source of
truth for this derivation now — the official bench self-upgrades to
its corpus and tools/scale_gate.py ensures the same one. This file
stays as the r11-r13 historical tool; keep its offsets in sync with
ScaleCorpus.Remap if it is ever used again.

Id offsets preserve every modular contract the queries rely on:
  - doc_id offset is a multiple of 20  (q49/q104/q108/q112's
    doc_id % 20 == 0 benchmark slice keeps its 5% share per replica)
  - vec_id offset is even              (q110's even/odd snapshot halves)
  - texts/embeddings/ts are NOT perturbed: replicas are exact content
    duplicates, which is precisely the duplication stress the dedup
    family should absorb (caps, not pair blowups)
Dimension tables (region/nation/part/supplier) copy through unchanged;
fact foreign keys into them stay valid. customer/orders/lineitem shift
custkey/orderkey consistently so joins land inside each replica.
"""
import sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1d"
SF = "/root/testdata/sf0.1"
N = 10

# (table, [(column, offset_per_replica)]) — offsets chosen above the
# sf0.1 max key and respecting the modular contracts in the module doc
REMAP = {
    "documents": [("doc_id", 5000)],          # max 4999; 5000 % 20 == 0
    "embeddings": [("vec_id", 2000)],         # max 1999; even
    "events": [("event_id", 100000), ("user_id", 1500)],
    "orders": [("o_orderkey", 150000), ("o_custkey", 15000)],
    "lineitem": [("l_orderkey", 150000)],
    "customer": [("c_custkey", 15000)],
}
COPY = ["region", "nation", "part", "supplier"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(f"""COPY (SELECT * FROM read_parquet('{SF}/{t}.parquet'))
                        TO '{OUT}/{t}.parquet' (FORMAT PARQUET)""")
        print(f"{t}: copied")
    for t, shifts in REMAP.items():
        cols = [row[0] for row in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        ).fetchall()]
        parts = []
        for k in range(N):
            sel = ", ".join(
                f"{c} + {dict(shifts)[c] * k} AS {c}" if c in dict(shifts)
                else c for c in cols)
            parts.append(
                f"SELECT {sel} FROM read_parquet('{SF}/{t}.parquet')")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows (x{N})")


if __name__ == "__main__":
    main()
