#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the outputs a prior `graft.Verify` run left in outdir (one parquet dir per query
plus oracle_sql.json), executes each oracle SQL in DuckDB over the sfdir parquet tables,
and compares: row count, column names, and value-hash with columns sorted by name.
Run Verify first: sbt "runMain graft.Verify <sfdir> <outdir>".
Usage: python3 tools/check_oracle.py [sfdir] [outdir]

Round-1 lesson: the driver's canonicalization diverged from a naive fetchall() compare
on DECIMAL and HUGEINT columns (DuckDB SUM(int) window → INT128; pandas renders those
as float64 while Spark's parquet holds int64/decimal). So besides the value compare,
this gate FAILS any query whose Spark output or oracle result carries a type the
driver is known to canonicalize unpredictably: DECIMAL, HUGEINT/UHUGEINT. Queries must
surface money as DOUBLE and counters as BIGINT on BOTH sides.
"""
import sys, os, json, glob
from decimal import Decimal
import datetime
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

RISKY_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def risky(type_names):
    return [t for t in type_names if any(r in str(t).upper() for r in RISKY_TYPES)]


def canon(rows, cols):
    """Sort columns by name, stringify values deterministically, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, Decimal):
            return repr(float(v))
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat(sep=" ")
        return str(v)

    return sorted(tuple(cv(r[i]) for i in order) for r in rows)


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_types = [d[1] for d in got.description]
        got_rows = got.fetchall()
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_types = [d[1] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = []
        bad = risky(got_types)
        if bad:
            problems.append(f"spark output has driver-risky types {bad}")
        bad = risky(exp_types)
        if bad:
            problems.append(f"oracle result has driver-risky types {bad}")
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows spark={len(got_rows)} oracle={len(exp_rows)}")
        if not problems:
            g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
            if g != e:
                diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
                problems.append(f"hash mismatch, first diff row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
