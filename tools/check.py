#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Assumes graft.Verify has already written <verifyOutDir>/<name>/ parquet
dirs plus oracle_sql.json. For each declared oracle: run the SQL in
DuckDB over the sfDir parquet tables, load the Spark result parquet,
sort columns by name + rows by all values, and compare cell-by-cell
(exact for non-floats, 1e-6 rel tolerance reported separately for
floats so we can see hash-risk before the driver does).
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    # sort columns by name, then rows lexicographically (stringified)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [[r[i] for i in order] for r in rows]
    return sorted(out, key=lambda r: [str(x) for x in r]), [cols[i] for i in order]

def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True, True
        exact = fa == fb
        close = abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
        return exact, close
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False, False
        pairs = [cells_equal(x, y) for x, y in zip(a, b)]
        return all(p[0] for p in pairs), all(p[1] for p in pairs)
    return a == b, a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results_dirs = [d for d in sorted(os.listdir(outdir))
                    if os.path.isdir(f"{outdir}/{d}")]
    n_pass = n_close = n_fail = 0
    for name in results_dirs:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output parquet")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracles:
            print(f"rows  {name}: {len(grows)} rows (no oracle declared)")
            continue
        try:
            want = con.execute(oracles[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
            # The driver hashes typed values; DuckDB types outside this set
            # (HUGEINT from sum(int), DECIMAL, unsigned ints) round-trip
            # through pandas differently from Spark's output and hash-
            # mismatch even when the Python values compare equal here.
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            safe = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                    "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN")
            odd = [(c[0], c[1]) for c in desc
                   if c[1].split("(")[0] not in safe
                   and not c[1].endswith("[]")]
            if odd:
                print(f"FAIL  {name}: oracle result has driver-unsafe "
                      f"DuckDB types {odd} (cast them, e.g. HUGEINT->BIGINT)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        grows, gcols = norm(grows, gcols)
        wrows, wcols = norm(wrows, wcols)
        if gcols != wcols:
            print(f"FAIL  {name}: columns differ spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL  {name}: rowcount spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        exact = close = True
        bad = None
        for i, (gr, wr) in enumerate(zip(grows, wrows)):
            for j, (g, w) in enumerate(zip(gr, wr)):
                e, c = cells_equal(g, w)
                exact &= e
                close &= c
                if not c and bad is None:
                    bad = (i, gcols[j], g, w)
        if exact:
            print(f"PASS  {name}: {len(grows)} rows exact")
            n_pass += 1
        elif close:
            print(f"CLOSE {name}: {len(grows)} rows within 1e-6 but NOT exact (hash risk)")
            n_close += 1
        else:
            print(f"FAIL  {name}: first diff row={bad[0]} col={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
    undeclared = [n for n in oracles if n not in results_dirs]
    for n in undeclared:
        print(f"FAIL  {n}: oracle declared but no spark result")
        n_fail += 1
    print(f"== {n_pass} exact, {n_close} close, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
