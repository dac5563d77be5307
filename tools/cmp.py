#!/usr/bin/env python3
"""Compare a DevCheck CSV dump against its oracle SQL in DuckDB.
Usage: cmp.py <name> <csv_dir> <sql_file> [sf_dir]"""
import duckdb, glob, csv, sys

name, outdir, sqlfile = sys.argv[1], sys.argv[2], sys.argv[3]
sfdir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    except Exception:
        pass

rows, cols = [], None
for f in glob.glob(outdir + "/*.csv"):
    with open(f) as fh:
        r = csv.reader(fh)
        cols = next(r)
        rows.extend(tuple(x) for x in r)

oracle = con.execute(open(sqlfile).read())
ocols = [d[0] for d in oracle.description]
orows = [tuple("" if v is None else str(v) for v in row) for row in oracle.fetchall()]

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            try:
                f = float(v)
                v = repr(int(f)) if f == int(f) else repr(f)
            except (ValueError, TypeError):
                pass
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)

a, b = norm(cols, rows), norm(ocols, orows)
ok = a == b and sorted(cols) == sorted(ocols)
print(name, "PASS" if ok else "FAIL", f"{len(rows)} rows")
if not ok:
    print(" cols spark:", sorted(cols), "\n cols oracle:", sorted(ocols))
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            print(f" first diff row {i}:\n  spark : {x}\n  oracle: {y}")
            break
    if len(a) != len(b):
        print(f" row counts: spark {len(a)} oracle {len(b)}")
    sys.exit(1)
