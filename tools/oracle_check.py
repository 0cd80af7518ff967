#!/usr/bin/env python3
"""Local replica of the driver's correctness compare.

Usage: python3 tools/oracle_check.py <verifyOutDir> [namePrefix...]

Reads each <outDir>/<name> spark parquet dump plus <outDir>/oracle_sql.json,
runs the oracle SQL in DuckDB over the sf tables (views named after the
parquet files), then compares rows / schema (column-name sets) / cell hash
with columns sorted by name and FLOATS formatted %.10g — the driver's
convention (see the verify skill: a str()-based compare false-alarms on
literal-vs-computed doubles, e.g. the patients pipeline's 66·2.54 =
167.64000000000001 vs the oracle's literal-derived 167.64 — identical at
10 significant digits, which is what the driver hashes). Dev tool only
(driver-side python).
"""
import sys, os, json, glob, hashlib
import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fmt(c):
    return ("%.10g" % c) if isinstance(c, float) else str(c)


def cells(rows):
    return [tuple(fmt(c) for c in r) for r in rows]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    named = sorted(cols)
    out = sorted(tuple(r[i] for i in order) for r in cells(rows))
    return named, out


def main():
    out_dir = sys.argv[1]
    prefixes = sys.argv[2:]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            if os.path.isdir(p)
            else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(x) for x in prefixes):
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[check] {name}: MISSING spark dump")
            fails += 1
            continue
        s = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
        )
        s_cols = [d[0] for d in s.description]
        s_rows = s.fetchall()
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"[check] {name}: ORACLE ERROR {e}")
            fails += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        oc, orr = canon(o_cols, o_rows)
        rows_ok = len(sr) == len(orr)
        schema_ok = sc == oc
        h = lambda rows: hashlib.md5(repr(rows).encode()).hexdigest()
        hash_ok = h(sr) == h(orr)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"[check] {name}: {status} rows={len(sr)}/{len(orr)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
        if status == "FAIL":
            fails += 1
            if not schema_ok:
                print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
            if schema_ok and not hash_ok:
                for a, b in zip(sr, orr):
                    if a != b:
                        print(f"  spark:  {a}\n  oracle: {b}")
                        break
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
