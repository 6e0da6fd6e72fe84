#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs DuckDB over the oracle SQL dumped by `graft.Verify` and compares each
result against the parquet the Spark side wrote. Comparison: sort columns by
name, sort rows, exact value equality (floats compared bitwise after a
repr-normalization, mirroring a hash-based compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # sort columns by name, then rows by stringified tuple (mirrors driver)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            cur2 = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in cur2.description]
            s_rows = cur2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        oc, orows = canon(o_rows, o_cols)
        sc, srows = canon(s_rows, s_cols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1
        elif orows != srows:
            n_fail += 1
            diff = [(a, b) for a, b in zip(orows, srows) if a != b]
            print(f"FAIL {name}: {len(orows)} vs {len(srows)} rows, "
                  f"{len(diff)} mismatched; first: "
                  f"{diff[0] if diff else (orows[-1], srows[-1] if srows else None)}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
