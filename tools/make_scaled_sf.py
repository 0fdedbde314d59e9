#!/usr/bin/env python3
"""Scale an sf dir by K via key-shifted replication (default K=10:
sf0.1 -> sf1) for the §8 scale probe.

Replication preserves every distribution the queries filter on
(mktsegments, event types, text vocabulary, brand lists) and keeps
referential integrity by shifting each key family by the same
copy-sized base on both sides of every join. Dims (region, nation)
keep their fixed cardinality, as TPC-H scaling does.

Near-dup realism: a naive 10x copy would make every document/vector
an exact duplicate of 9 others and blow pair-emitting dedup queries
up ~45x instead of 10x. So copies i>0 perturb:
  - documents: every 3rd word gets a "-i" suffix (every 5-gram hits
    a modified word -> no cross-copy shingle collisions; WITHIN-copy
    near-dup structure is preserved because the rewrite is
    position-deterministic);
  - embeddings: the vector is rotated by i positions (norm and
    coordinate distribution preserved; cosine to the original decays
    to noise).

Usage: python3 tools/make_scaled_sf.py <srcSfDir> <dstDir> [K]
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# key column -> base multiplier source table (max key + 1)
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__users__"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
          "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
          "embeddings": "vec_id"}


def main(src, dst, k=10):
    import os
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet")
              for t in "region nation customer supplier part orders lineitem events documents embeddings".split()}
    base = {t: pa.compute.max(tables[t][KEY_OF[t]]).as_py() + 1 for t in KEY_OF}
    base["__users__"] = pa.compute.max(tables["events"]["user_id"]).as_py() + 1

    for t in ("region", "nation"):
        pq.write_table(tables[t], f"{dst}/{t}.parquet")
        print(f"{t}: {tables[t].num_rows} rows (dim, unscaled)")

    for t, shifts in SHIFTS.items():
        src_tbl = tables[t]
        copies = []
        for i in range(k):
            cols = {}
            for name in src_tbl.column_names:
                col = src_tbl[name]
                if name in shifts:
                    off = i * base[shifts[name]]
                    col = pa.compute.add(col, off).cast(col.type)
                elif t == "documents" and name == "text" and i > 0:
                    col = pa.array(
                        [" ".join(w if j % 3 else f"{w}-{i}"
                                  for j, w in enumerate(v.as_py().split(" ")))
                         for v in col.combine_chunks()],
                        type=col.type)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    col = pa.array(
                        [v.as_py()[i:] + v.as_py()[:i] for v in col.combine_chunks()],
                        type=col.type)
                cols[name] = col
            if t == "documents" and i > 0:
                cols["n_chars"] = pa.array(
                    [len(v.as_py()) for v in cols["text"]], type=pa.int64())
            copies.append(pa.table(cols, schema=src_tbl.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {src_tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
