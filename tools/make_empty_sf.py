#!/usr/bin/env python3
"""Build an all-empty sf dir with the EXACT parquet schemas of a real
one (including events.ts TIMESTAMP(NANOS), which a DuckDB COPY would
rewrite to plain TIMESTAMP and break Tables' type contract).

Usage: python3 tools/make_empty_sf.py <srcSfDir> <dstDir>

Then drive every registered query through it:
    sbt -batch "runMain graft.Verify <dstDir> /tmp/v_empty"
Zero `[verify] ... failed:` lines = every operator degrades to an
empty result on a day-one/empty source instead of crashing.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(src, dst):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        schema = pq.read_schema(p)
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in schema}, schema=schema)
        pq.write_table(empty, f"{dst}/{t}.parquet")
        print(f"{t}: 0 rows, schema preserved")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
