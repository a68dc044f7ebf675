#!/usr/bin/env python3
"""Scale the sf0.1 fixture ~10x into an sf1-shaped corpus for bench runs.

The driver ships sf{0.001,0.01,0.1}; the 100x-scale claims in the plan
audit deserve at least one measured 10x point. This replicates every fact
table `factor` times with disjoint key ranges (replica i offsets all keys
by i*10^7), preserving schema byte-for-byte (pyarrow round-trip, so the
events table keeps timestamp[ns]):

- documents: replica i>0 rewrites ' ' -> ' r{i} ' — original tokens (and
  the stopword/langid distribution) survive, within-replica near-dup
  structure is preserved (both members of a pair transform identically),
  but shingles/tokens differ ACROSS replicas so replicas don't collapse
  into one giant near-dup cluster.
- embeddings: replica i rotates each vector by i components — norms and
  within-replica geometry are exact, cross-replica cosines decorrelate.
- dimension tables (nation, region) are NOT replicated; fact FKs keep
  their original nation/region keys so star joins stay valid.

Usage: python3 scripts/make_sf1.py [src] [dst] [factor]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

import os
os.makedirs(DST, exist_ok=True)

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["nation", "region"]


def offset_keys(tbl: pa.Table, name: str, i: int) -> pa.Table:
    for key in KEY_OFFSETS[name]:
        idx = tbl.schema.get_field_index(key)
        typ = tbl.schema.field(idx).type
        shifted = pc.add(tbl.column(key), pa.scalar(i * OFF, type=typ))
        tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
    return tbl


def replicate(name: str):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    out = []
    for i in range(FACTOR):
        tbl = offset_keys(src, name, i)
        if name == "documents" and i > 0:
            idx = tbl.schema.get_field_index("text")
            text = pc.replace_substring(tbl.column("text"), " ", f" r{i} ")
            tbl = tbl.set_column(idx, tbl.schema.field(idx), text)
            nidx = tbl.schema.get_field_index("n_chars")
            tbl = tbl.set_column(nidx, tbl.schema.field(nidx),
                                 pc.cast(pc.utf8_length(text), pa.int64()))
        if name == "embeddings" and i > 0:
            embs = tbl.column("embedding").to_pylist()
            rot = [v[i % len(v):] + v[:i % len(v)] if v else v for v in embs]
            eidx = tbl.schema.get_field_index("embedding")
            tbl = tbl.set_column(
                eidx, tbl.schema.field(eidx),
                pa.array(rot, type=tbl.schema.field(eidx).type))
        out.append(tbl)
    merged = pa.concat_tables(out)
    pq.write_table(merged, f"{DST}/{name}.parquet")
    print(f"{name}: {src.num_rows} -> {merged.num_rows}")


for name in COPY_ONLY:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} (copied)")
for name in KEY_OFFSETS:
    replicate(name)
print(f"wrote {DST}")
