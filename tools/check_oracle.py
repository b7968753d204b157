#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Not part of the library (the engine is pure Scala/Spark); this script only
reproduces the driver's correctness gate locally so oracle SQL can be fixed
before a round ends.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.renderedOracleSql substitutes __SF_TAG__ before dumping; keep a
    # defensive render here so a stale/hand-built oracle_sql.json still runs.
    # Same sanitization as TextOps.sfTag, or the fallback would glob a path
    # that differs from where the Spark side actually dumped.
    import re
    sf_tag = re.sub(r"[^A-Za-z0-9._-]", "_", sf_dir.rstrip("/").split("/")[-1])
    oracle = {k: v.replace("__SF_TAG__", sf_tag) for k, v in oracle.items()}
    n_ok = n_bad = 0
    import os
    present = {n for n in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{n}")}
    skipped = sorted(set(oracle) - present)
    if skipped:
        print(f"(skipping {len(skipped)} queries not in this filtered run)")
    for name, sql in sorted(oracle.items()):
        if name not in present:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_bad += 1
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns differ spark={g_cols} duck={e_cols}")
            n_bad += 1
            continue
        # The driver's hash is TYPE-sensitive across dtype FAMILIES: a DuckDB
        # HUGEINT (bare SUM(int)) lands in pandas as float64/object vs Spark's
        # int64 and hash-mismatches despite equal values. Integer-width
        # differences (int32 vs int64, e.g. row_number) are proven harmless
        # (q40/q42/q43 pass the driver). Compare dtype *kind* only.
        dt_diff = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in g_cols
                   if got[c].dtype.kind != exp[c].dtype.kind]
        if dt_diff:
            print(f"FAIL {name}: dtypes differ (spark vs duck): {dt_diff}")
            n_bad += 1
            continue
        g = got[g_cols].applymap(norm)
        e = exp[e_cols].applymap(norm)
        g_rows = sorted(map(tuple, g.values.tolist()))
        e_rows = sorted(map(tuple, e.values.tolist()))
        if g_rows == e_rows:
            print(f"OK   {name} ({len(g_rows)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: rows spark={len(g_rows)} duck={len(e_rows)}")
            for i, (a, b) in enumerate(zip(g_rows, e_rows)):
                if a != b:
                    print(f"  first diff @{i}:\n   spark={a}\n   duck ={b}")
                    break
    print(f"\n{n_ok} ok / {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
