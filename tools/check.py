#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and compare (columns sorted by name, rows sorted,
values compared exactly; float near-misses reported separately).

Usage: python3 tools/check.py <sfdir> <verify_outdir>
(driver-side tooling only — not part of the Scala library)
"""
import sys, json, math, os
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in idx], out

def norm(v):
    if isinstance(v, float) and v.is_integer():
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, 'tolist'):  # numpy arrays from duckdb
        return tuple(norm(x) for x in v.tolist())
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v

def eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or (math.isnan(a) and math.isnan(b))
        except TypeError:
            return False
    return a == b

def tfam(t):
    """Collapse DuckDB types into driver-hash equivalence families.
    HUGEINT is deliberately NOT in the int family: it surfaces as a
    Python int128 object and hash-mismatches Spark's int64."""
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int64"
    return t

def close(a, b, rtol=1e-9):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, (float, int)):
        return a == b or abs(a - b) <= rtol * max(1.0, abs(a), abs(b))
    return eq(a, b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{name}"
        if not os.path.isdir(pdir):
            results[name] = "MISSING_SPARK_OUTPUT"; continue
        try:
            sp = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            sp_types = dict(zip(sp.columns, [str(t) for t in sp.types]))
            sp_cols, sp_rows = canon(sp.fetchall(), [d[0] for d in sp.description])
        except Exception as e:
            results[name] = f"SPARK_READ_ERR {e}"; continue
        try:
            du = con.sql(sql)
            du_types = dict(zip(du.columns, [str(t) for t in du.types]))
            du_cols, du_rows = canon(du.fetchall(), [d[0] for d in du.description])
        except Exception as e:
            results[name] = f"ORACLE_ERR {str(e)[:200]}"; continue
        if sp_cols != du_cols:
            results[name] = f"COLS spark={sp_cols} oracle={du_cols}"; continue
        # dtype-strict: the driver hashes typed values, so a HUGEINT oracle vs a
        # BIGINT spark column hash-mismatches even when every value is equal.
        # Python's == would hide that (int(5) == int128(5)), so compare the
        # DuckDB result types. Ints up to 64-bit are one equivalence class —
        # the driver's hash tolerates INTEGER vs BIGINT (38 such queries are
        # hash-green in CORRECTNESS_r06) — but HUGEINT, DECIMAL vs DOUBLE and
        # FLOAT vs DOUBLE are exactly the divergences that ship as driver reds.
        bad_t = {c: (sp_types[c], du_types[c]) for c in sp_cols
                 if tfam(sp_types.get(c)) != tfam(du_types.get(c))}
        if bad_t:
            results[name] = f"DTYPE {bad_t}"; continue
        if len(sp_rows) != len(du_rows):
            results[name] = f"ROWS spark={len(sp_rows)} oracle={len(du_rows)}"; continue
        bad = [(a, b) for a, b in zip(sp_rows, du_rows) if not all(eq(x, y) for x, y in zip(a, b))]
        if not bad:
            results[name] = "OK"
        elif all(all(close(x, y) for x, y in zip(a, b)) for a, b in bad):
            results[name] = f"CLOSE ({len(bad)} rows differ <1e-9) e.g. {bad[0]}"
        else:
            results[name] = f"DIFF {len(bad)} rows, e.g. spark={bad[0][0]} oracle={bad[0][1]}"
    # queries without oracle: rows-only check
    for name in sorted(os.listdir(outdir)):
        if os.path.isdir(f"{outdir}/{name}") and name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
            results[name] = f"ROWS_ONLY n={n}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        flag = "✓" if v == "OK" else ("~" if v.startswith(("ROWS_ONLY", "CLOSE")) else "✗")
        print(f"{flag} {k}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle-exact, {len(results)} total")

if __name__ == "__main__":
    main()
