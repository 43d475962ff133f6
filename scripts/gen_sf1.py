#!/usr/bin/env python3
"""Synthesize an sf1 validation tier from /root/testdata/sf0.1.

The driver ships sf{0.001,0.01,0.1}; scale-dependent bug classes (AQE
plan flips, broadcast-threshold changes, duplicate-heavy corpora) need
one tier above the bench scale. This replicates every fact table 10x
with a per-copy key offset (stride 100M keeps every key space disjoint)
and leaves the fixed dimensions (region, nation) alone:

- copy 0 keeps the original ids, so queries that bound their input by
  id (doc_id/vec_id < 1000) see byte-identical inputs at every scale;
- replicated documents/embeddings are EXACT duplicates under new ids —
  deliberately: a duplicate-heavy corpus is the realistic stress for
  the dedup pipelines, and it reproduces at 10x the scale the class of
  bug that sf0.1's real duplicates caught in streaming dedup;
- schemas are preserved bit-for-bit via pyarrow (events.ts keeps
  whatever precision the driver shipped — timestamp[us] since
  2026-08-13, timestamp[ns] before; DuckDB vs Spark precision parity
  depends on replicas matching the source tier exactly).

Usage: python3 scripts/gen_sf1.py [outdir]   (default testdata-sf1/)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 100_000_000

# key columns that must stay globally unique across copies
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name in SINGLE_COPY:
        src = os.path.join(SRC, f"{name}.parquet")
        t = pq.read_table(src)
        pq.write_table(t, os.path.join(outdir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (single copy)")
    for name, keys in OFFSET_COLS.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        copies = []
        for i in range(COPIES):
            c = t
            if i > 0:
                for k in keys:
                    idx = c.schema.get_field_index(k)
                    shifted = pc.add(c.column(k), pa.scalar(i * STRIDE, type=c.schema.field(k).type))
                    c = c.set_column(idx, c.schema.field(k), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        assert out.schema.equals(t.schema), f"{name}: schema drifted"
        pq.write_table(out, os.path.join(outdir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "testdata-sf1")
