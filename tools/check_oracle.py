#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the sf dir's
parquet files registered as views, and compares row sets (columns
sorted by name, rows sorted, values stringified with float rounding).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            # Fixed-point at the protocol's 4-dp rounding: %.6g would
            # collapse large-magnitude aggregates (9876543.2101 and
            # 9876544.9999 both print 9.87654e+06) and mask real
            # cross-engine divergence.
            return f"{v:.4f}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        s_cols = [d[0] for d in spark_rel.description]
        s_rows = spark_rel.fetchall()
        try:
            # con.sql keeps real DuckDB types (DBAPI description
            # collapses them all to 'NUMBER').
            duck_rel = con.sql(sql)
            d_cols = list(duck_rel.columns)
            d_types = [str(t) for t in duck_rel.types]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-sensitive: DuckDB sum() of an
        # integer yields HUGEINT (int128), which hash-mismatches a
        # Spark BIGINT even when the values are identical. Fail here
        # so the local gate can never diverge from the driver's.
        bad_types = [
            (c, t) for c, t in zip(d_cols, d_types)
            if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()
        ]
        if bad_types:
            print(f"FAIL {name}: oracle column(s) need CAST "
                  f"(driver hash is type-sensitive): "
                  + ", ".join(f"{c}:{t}" for c, t in bad_types))
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} != {sorted(d_cols)}")
            n_fail += 1
            continue
        cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
        if cs == cd:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(s_rows)} spark vs {len(d_rows)} duckdb rows")
            only_s = [r for r in cs if r not in cd][:3]
            only_d = [r for r in cd if r not in cs][:3]
            if only_s:
                print("  only-spark:", only_s)
            if only_d:
                print("  only-duckdb:", only_d)
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
