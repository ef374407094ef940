#!/usr/bin/env python
"""Build an sf1.0-scale dataset by replicating sf0.1 N times (default 10)
with disjoint keys — the whole-suite scale-bench input (PERF.md r8).

Replication protocol (extends the r7 curation-layer protocol to every
table):

- region/nation: copied as-is (true dimensions; replicating them would
  corrupt nationkey semantics rather than model growth).
- customer/supplier/part/orders/lineitem/events: every key column is
  shifted by copy_index * KEY_STRIDE so joins stay 1:1 within a copy and
  never match across copies — cardinalities grow 10x, join fan-out does
  not.
- documents: doc_id shifted; copies > 0 get a distinct leading salt
  token so WITHIN-copy duplicate structure is preserved instead of
  turning the corpus into 90% cross-copy duplicates (the r7 protocol);
  n_chars recomputed to stay consistent with the salted text.
- embeddings: vec_id shifted; each copy's vectors are ROLLED by the copy
  index (np.roll along the vector), which preserves norms and
  within-copy geometry exactly while decorrelating cross-copy vectors —
  a real 10x corpus does not contain every vector 10 times, and exact
  copies would make every pair query's OUTPUT quadratic in the
  replication factor (the annotated r3/r7 effect) instead of measuring
  the engine.

Usage: python scale_dataset.py [out_dir] [copies] [src_dir] [row_group_rows]
Defaults: /tmp/sfscale/sf1.0  10  /root/testdata/sf0.1  8192

``row_group_rows`` (r11 verdict #5): the driver's sf parquet is ONE row
group per table, so every scan is one task and per-row mapper work runs
serially until the first exchange — the single-row-group trap
spread_small_scan exists for. Writing scale-experiment data with many
row groups makes the 100 TB posture testable locally: Spark assigns a
file's row groups to byte-range splits (maxSplitBytes =
min(maxPartitionBytes, max(openCostInBytes, bytes/minPartitionNum))),
so a multi-row-group file splits into ~bytes/4 MB tasks by default
(openCostInBytes floors the split size at 4 MB) — set
spark.sql.files.openCostInBytes lower in the experiment session when
the goal is split-count ≥ cores on MB-scale fixtures. With splits ≥
parallelism, spread_small_scan's probe sees a well-split input and adds
no exchange (its designed no-op path).
"""

from __future__ import annotations

import os
import sys

KEY_STRIDE = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1.0"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    rg_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    os.makedirs(out, exist_ok=True)

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()

    def gen(table: str, select_for_copy) -> None:
        parts = [select_for_copy(i) for i in range(copies)]
        sql = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({sql}) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg_rows})"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    gen("customer", lambda i: f"""
        SELECT c_custkey + {i * KEY_STRIDE} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet'""")
    gen("supplier", lambda i: f"""
        SELECT s_suppkey + {i * KEY_STRIDE} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet'""")
    gen("part", lambda i: f"""
        SELECT p_partkey + {i * KEY_STRIDE} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet'""")
    gen("orders", lambda i: f"""
        SELECT o_orderkey + {i * KEY_STRIDE} AS o_orderkey,
               o_custkey + {i * KEY_STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")
    gen("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * KEY_STRIDE} AS l_orderkey,
               l_partkey + {i * KEY_STRIDE} AS l_partkey,
               l_suppkey + {i * KEY_STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")
    gen("events", lambda i: f"""
        SELECT event_id + {i * KEY_STRIDE} AS event_id, ts,
               user_id + {i * KEY_STRIDE} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet'""")
    gen("documents", lambda i: f"""
        SELECT doc_id + {i * KEY_STRIDE} AS doc_id,
               {"text" if i == 0 else f"'repl{i} ' || text"} AS text,
               lang, source, CAST(length({
                   "text" if i == 0 else f"'repl{i} ' || text"
               }) AS BIGINT) AS n_chars
        FROM '{src}/documents.parquet'""")

    # embeddings: rolled copies via numpy (SQL can't roll a list cheaply)
    emb = con.sql(f"SELECT * FROM '{src}/embeddings.parquet'").arrow()
    vec = np.asarray(emb["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist(),
                     dtype=np.float32)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    tables = []
    for i in range(copies):
        rolled = np.roll(vec, i, axis=1)
        tables.append(pa.table({
            "vec_id": pa.array(ids + i * KEY_STRIDE, type=pa.int64()),
            "embedding": pa.array(rolled.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }))
    pq.write_table(pa.concat_tables(tables), f"{out}/embeddings.parquet",
                   row_group_size=rg_rows)
    n = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows")


if __name__ == "__main__":
    main()
