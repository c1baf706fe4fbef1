#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's correctness gate: for each <name>.parquet under the
verify output dir, run oracle_sql.json[name] in DuckDB over the same
scale-factor parquet tables, sort columns by name, sort rows, and compare
values. Reports per-query PASS/FAIL with first differing rows.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out, [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # Registry diff: a query that crashed before producing output must
    # read as a FAILURE, not vanish from the report.
    for name in sorted(set(oracles) - set(names)):
        print(f"FAIL {name}: no output produced (query crashed in Verify?)")
        n_fail += 1
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sres = con.execute(f"SELECT * FROM '{spark_glob}'")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_c, s_cols = canon(srows, scols)
        o_c, o_cols = canon(orows, ocols)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(s_c) != len(o_c):
            print(f"FAIL {name}: rowcount spark={len(s_c)} oracle={len(o_c)}")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_c, o_c)) if a != b]
        if diffs:
            i, a, b = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(s_c)} rows differ; "
                  f"first at {i} cols={s_cols}\n  spark : {a}\n  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_c)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
