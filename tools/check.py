#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB views over
<sfDir>/*.parquet, loads the Spark result from <verifyOutDir>/<name>/,
sorts columns by name and rows by value, and compares cell-by-cell.
"""
import sys, os, json, glob, math
import duckdb

def norm_cell(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def find_unhashable_cols(df):
    """Columns holding dict/ndarray/list cells. Used ONLY to enrich the
    error message when driver_sort (below) crashes — the crash itself is
    the gate, this just names the offending columns."""
    import numpy as np
    def bad(v):
        if isinstance(v, (dict, np.ndarray, list, set)):
            return True
        if isinstance(v, tuple):
            return any(bad(x) for x in v)
        return False
    return [c for c in df.columns
            if df[c].dtype.kind == "O" and any(bad(v) for v in df[c])]

def driver_sort(df):
    """The DRIVER's own row-sort, on RAW cells: it pandas-sorts rows across
    all columns before hashing, so any dtype it cannot sort (dict →
    CORRECTNESS_r14, ndarray → CORRECTNESS_r15 cy_set_label) crashes
    there. Running the identical operation here makes this replica
    structurally incapable of passing an entry the driver crashes on —
    do NOT normalize cells before this call."""
    return df.sort_values(by=list(df.columns))

def cells_equal(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if isinstance(a, float) and isinstance(b, (float, int)):
        return a == b or abs(a - b) < 1e-12
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # Hash-surface type check: the driver hashes the pandas
            # rendering, so a HUGEINT/DECIMAL oracle column (pandas float
            # or object) against a Spark int64 hash-mismatches even when
            # the VALUES compare equal here (Python 1.0 == 1). Wrap such
            # aggregates in CAST(... AS BIGINT)/round(...) in the oracle.
            widened = [c for c, t in zip(rel.columns, rel.types)
                       if str(t) in ("HUGEINT", "UHUGEINT")
                       or str(t).startswith("DECIMAL")]
            if widened:
                print(f"FAIL {name}: oracle column(s) {widened} are "
                      f"HUGEINT/DECIMAL — cast to BIGINT/DOUBLE in the SQL")
                n_fail += 1
                continue
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        # The driver's own sort, on the RAW frames: any dtype it cannot
        # sort errs the real gate row, so it must err here identically.
        crashed = False
        for side, df in (("oracle", odf), ("spark", sdf)):
            try:
                driver_sort(df)
            except Exception as e:
                print(f"FAIL {name}: driver sort_values crashed on {side} "
                      f"frame ({type(e).__name__}: {e}); offending columns "
                      f"{find_unhashable_cols(df)} — flatten arrays with "
                      f"array_join and structs with to_json on both engines")
                crashed = True
                break
        if crashed:
            n_fail += 1
            continue
        mismatch = [c for c in odf.columns if c in sdf.columns
                    and odf[c].dtype.kind in "if" and sdf[c].dtype.kind in "if"
                    and odf[c].dtype.kind != sdf[c].dtype.kind]
        if mismatch:
            print(f"FAIL {name}: numeric-kind mismatch (int vs float) on "
                  f"{mismatch}: oracle {[str(odf[c].dtype) for c in mismatch]} "
                  f"vs spark {[str(sdf[c].dtype) for c in mismatch]}")
            n_fail += 1
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        orows = sorted((tuple(norm_cell(v) for v in r) for r in
                        odf[ocols].itertuples(index=False)), key=repr)
        srows = sorted((tuple(norm_cell(v) for v in r) for r in
                        sdf[scols].itertuples(index=False)), key=repr)
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            if orows[:2]: print("  oracle sample:", orows[:2])
            if srows[:2]: print("  spark sample:", srows[:2])
            n_fail += 1
            continue
        bad = [(o, s) for o, s in zip(orows, srows) if not cells_equal(o, s)]
        exact = orows == srows
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first: {bad[0]}")
            n_fail += 1
        else:
            tag = "exact" if exact else "tol-only(!)"
            print(f"PASS {name}: {len(orows)} rows [{tag}]")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
