#!/usr/bin/env python3
"""Oracle TYPE-signature guard — the q150 class of red row.

The value checker (check_oracle.py) compares str()-normalized cells, which
erases integer width: DuckDB widens sum(BIGINT) to HUGEINT and integer
'*'/'-' to HUGEINT/DECIMAL, so an oracle can be value-identical to the
Spark output yet hash-mismatch under the driver's TYPED comparer (round 10:
q150_cms_counts, BIGINT vs HUGEINT, rows+schema green, hash red).

This guard DESCRIBEs both sides in the same DuckDB the driver uses — the
Spark output parquet and the oracle SQL — and requires the column type
lists to be IDENTICAL by column name. Any widening into an output column
fails here long before the driver sees it.

Usage: python3 tools/check_oracle_types.py <sfDir> <verifyOutDir>
Exit 1 on any mismatch.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def describe(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            stypes = describe(con, f"SELECT * FROM '{spark_glob}'")
        except Exception as e:
            print(f"SKIP {name}: no spark output to type-check ({e})")
            n_skip += 1
            continue
        try:
            otypes = describe(con, f"({oracles[name]})")
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if stypes == otypes:
            n_pass += 1
            continue
        n_fail += 1
        only_s = {k: v for k, v in stypes.items() if otypes.get(k) != v}
        only_o = {k: v for k, v in otypes.items() if stypes.get(k) != v}
        print(f"FAIL {name}: type signatures differ\n"
              f"  spark : {only_s}\n  oracle: {only_o}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skipped (no output)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
