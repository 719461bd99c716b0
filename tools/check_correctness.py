#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the tables
in <sfDir>, sorts columns by name and rows by all columns, and compares
cell-by-cell. Exact mismatches that are within 1e-9 relative float tolerance
are reported as NEAR (hash would fail — fix the query to be deterministic).

Dev-only tooling (driver-side python); not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_near = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        # strict type compare (driver checks schema match too)
        gt = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow().schema
        wt = con.execute(sql).arrow().schema
        tdiff = [(c, str(gt.field(c).type), str(wt.field(c).type))
                 for c in gcols if str(gt.field(c).type) != str(wt.field(c).type)]
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}")
            n_fail += 1
            continue
        g = got[gcols].sort_values(gcols).values.tolist()
        w = want[wcols].sort_values(wcols).values.tolist()
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        exact = True
        near = True
        first_diff = None
        for i, (gr, wr) in enumerate(zip(g, w)):
            for j, (a, b) in enumerate(zip(gr, wr)):
                a, b = norm(a), norm(b)
                if a == b or (a != a and b != b):
                    continue
                exact = False
                if isinstance(a, float) and isinstance(b, float):
                    if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                        continue
                near = False
                if first_diff is None:
                    first_diff = (i, gcols[j], a, b)
        if exact:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif near:
            print(f"NEAR {name}: float-only diffs (hash WOULD FAIL)")
            n_near += 1
        else:
            i, c, a, b = first_diff
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
    # queries without oracles: just check rows>0
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                status = "ROWS-ONLY pass" if n > 0 else "ROWS-ONLY EMPTY"
                print(f"{status} {name} ({n} rows)")
            except Exception as e:
                print(f"ROWS-ONLY FAIL {name}: {e}")
    print(f"\n== {n_pass} pass, {n_near} near, {n_fail} fail ==")
    sys.exit(1 if (n_fail or n_near) else 0)


if __name__ == "__main__":
    main()
