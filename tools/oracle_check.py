#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views over the same
<sfDir> parquet tables, sorts columns by name (the driver does this before
hashing), and compares row-by-row. Dev tool only — never shipped."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    n = len(cols[0]) if cols else 0
    return [tuple(canon(cols[i][r]) for i in order) for r in range(n)]

# Types the driver's canonicalizer is known to render differently from
# their portable cousins (HUGEINT vs BIGINT bit the round-8 board): any
# oracle whose DuckDB relation surfaces one of these — at top level or
# nested inside a LIST/STRUCT — must CAST it away.  This lint runs on
# the *planned* relation, so it catches the bug class before the driver.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT",
                "UINTEGER", "UBIGINT")

# Mirror of graft.OutputSurfaceSpec, applied to the SPARK output parquet:
# the driver sorts the raw pandas frame and hashes values, so a top-level
# nested column (sort_values: "unhashable type: numpy.ndarray") or a
# wide decimal (hashed through double; the two engines round the
# conversion 1 ulp apart) is ungradable even when this replica's
# canonicalizer would pass it.  Both round-10 reds were exactly these
# surfaces — the replica MUST be as strict as the driver.  Round 12
# proved the old >18-precision bound too lax (q62_unpivot DECIMAL(18,4)
# and lake_cow_prune DECIMAL(18,2) passed it and went driver-red on
# 12-14-digit sums): the provably-safe bound is precision <= 15, where
# the unscaled int is < 2^53 so every engine's decimal->double path
# (string parse, int128 descale, pandas) lands on the identical double.
SURFACE_ALLOW = set()  # name -> intentionally empty; mirror the Spec's list

def spark_surface_lint(tbl):
    import pyarrow as pa
    bad = []
    for field in tbl.schema:
        t = field.type
        if pa.types.is_nested(t):
            bad.append(f"{field.name}: nested {t} (driver sort_values cannot hash it)")
        elif pa.types.is_decimal(t) and t.precision > 15:
            bad.append(f"{field.name}: {t} (>15-precision decimal; unscaled values "
                       f"beyond 2^53 don't double-round-trip deterministically)")
    return bad

def type_lint(con, name, sql):
    """Return list of 'col: TYPE' offenders in the oracle's output schema."""
    import re
    rel = con.sql(sql)  # plans only; no execution
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        for b in BANNED_TYPES:
            if re.search(r"\b" + b + r"\b", t):
                bad.append(f"{col}: {t}")
                break
    return bad

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        tbl = pq.read_table(files[0])
        if name not in SURFACE_ALLOW:
            surface = spark_surface_lint(tbl)
            if surface:
                print(f"FAIL {name}: driver-ungradable Spark surface {surface}")
                n_fail += 1;  continue
        mine_names = tbl.column_names
        mine = rows_of([tbl.column(i).to_pylist() for i in range(tbl.num_columns)], mine_names)
        try:
            offenders = type_lint(con, name, sql)
            if offenders:
                print(f"FAIL {name}: non-portable oracle types {offenders} "
                      f"(CAST to the portable surface: BIGINT/INTEGER/DOUBLE/"
                      f"DECIMAL/VARCHAR/BOOLEAN/TIMESTAMP/DATE/BLOB)")
                n_fail += 1;  continue
            cur = con.execute(sql)
            theirs_names = [d[0] for d in cur.description]
            data = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}");  n_fail += 1;  continue
        theirs_cols = [[r[i] for r in data] for i in range(len(theirs_names))] if data else [[] for _ in theirs_names]
        theirs = rows_of(theirs_cols, theirs_names) if theirs_names else []
        if sorted(mine_names) != sorted(n.lower() for n in theirs_names) and \
           sorted(mine_names) != sorted(theirs_names):
            print(f"FAIL {name}: columns {sorted(mine_names)} vs {sorted(theirs_names)}")
            n_fail += 1;  continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rowcount {len(mine)} vs {len(theirs)}")
            n_fail += 1;  continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(mine, theirs)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(mine)} rows differ; first@{i}:\n  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
