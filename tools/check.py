#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet output
against the DuckDB oracle (oracle_sql.json) on the same sf dir and diff.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # canonicalize IEEE -0.0 (sorts/serializes differently)
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [cols[i] for i in order]
    return sorted(zip(*[[norm(v) for v in c] for c in cols]), key=sort_key) if cols else []


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            # Fetch via Arrow (like the driver): surfaces type round-trip
            # artifacts fetchall() hides, e.g. DuckDB HUGEINT -> float64.
            atbl = con.execute(sql).arrow()
            exp_names = atbl.column_names
            exp_cols = [c.to_pylist() for c in atbl.columns]
            exp = rows_of(exp_cols, exp_names)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        got_names = tbl.column_names
        got_cols = [c.to_pylist() for c in tbl.columns]
        got = rows_of(got_cols, got_names)
        if sorted(exp_names) != sorted(got_names):
            print(f"FAIL {name}: columns exp={sorted(exp_names)} got={sorted(got_names)}")
            n_fail += 1
            continue
        if exp == got:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            for i, (a, b) in enumerate(zip(exp, got)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n   exp={a}\n   got={b}")
                    break
            else:
                if len(exp) != len(got):
                    longer, which = (exp, "exp") if len(exp) > len(got) else (got, "got")
                    print(f"  extra {which} row: {longer[min(len(exp), len(got))]}")
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
