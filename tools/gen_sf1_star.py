#!/usr/bin/env python3
"""Dev-only sf1 star-schema fixture: scale the driver's sf0.1 tables 10x
by KEY-OFFSET REPLICATION so the round-17 full-suite sf1 bench can run
every query, not just the documents/embeddings soak subset.

Each fact/dim copy i shifts its surrogate keys by i * (max_key + 1) and
shifts its FOREIGN keys by the referenced table's stride — so join
fan-outs (lineitem:orders 4:1, orders:customer 10:1, events:user), value
domains (return flags, priorities, segments, brands, date ranges — every
literal the TPC-H-derived queries filter on), and per-key distributions
are EXACTLY sf0.1's at 10x the rows. nation/region are fixed-cardinality
dims and copy through unchanged; documents/embeddings come from
gen_sf1.py (the sparse twin), which plants the vec_id/source fixtures the
ANN/dedup queries assume.

NOT driver data - written to testdata_sf1_sparse/ (git-ignored), used
only for docs/perf/BENCH_r17_sf1.json. Uses driver-side python libs only.

Usage: python3 tools/gen_sf1_star.py [srcDir] [outDir] [copies]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1_sparse"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)


def load(name):
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def stride(tbl, col):
    return pc.max(tbl[col]).as_py() + 1


def replicate(tbl, shifts, copies):
    """shifts: {col: stride}; copy i adds i*stride to each listed col,
    casting back to the column's original type so schemas stay identical."""
    parts = []
    for i in range(copies):
        cols = {}
        for name in tbl.schema.names:
            c = tbl[name]
            if name in shifts and i > 0:
                c = pc.cast(pc.add(c, i * shifts[name]), tbl.schema.field(name).type)
            cols[name] = c
        parts.append(pa.table(cols, schema=tbl.schema))
    return pa.concat_tables(parts)


def write(name, tbl):
    pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {tbl.num_rows} rows")


# fixed dims: copy through
for name in ("region", "nation"):
    write(name, load(name))

customer = load("customer")
orders = load("orders")
lineitem = load("lineitem")
part = load("part")
supplier = load("supplier")
events = load("events")

ck = stride(customer, "c_custkey")
ok = stride(orders, "o_orderkey")
pk = stride(part, "p_partkey")
sk = stride(supplier, "s_suppkey")
ek = stride(events, "event_id")
uk = stride(events, "user_id")

write("customer", replicate(customer, {"c_custkey": ck}, copies))
write("orders", replicate(orders, {"o_orderkey": ok, "o_custkey": ck}, copies))
write("lineitem", replicate(
    lineitem, {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk}, copies))
write("part", replicate(part, {"p_partkey": pk}, copies))
write("supplier", replicate(supplier, {"s_suppkey": sk}, copies))
write("events", replicate(events, {"event_id": ek, "user_id": uk}, copies))
