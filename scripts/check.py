#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Loads each <outDir>/<name> parquet (Spark output), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB 1.0.0 against views over the
testdata parquet, sorts columns by name, and compares values row by row.

Faithful to the driver comparator (round-1 lesson): the driver pandas-
sorts and hashes EVERY query's output parquet — including no-oracle
rows — and crashes on array-typed cells ("unhashable type:
numpy.ndarray"). So any list-valued column in any output is a FAIL
here, before the value compare.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings", "events"]


class ArrayCell(Exception):
    pass


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        # the driver's pandas sort_values/hash crashes on ndarray cells;
        # mirror that as a hard failure instead of silently comparing
        raise ArrayCell("array-typed cell (driver comparator would crash)")
    return v


def dtype_kind(dt):
    """Collapse a pandas dtype to the equivalence class the driver's
    hash respects: all int widths hash identically for equal values,
    but int-vs-float (and bool/datetime/object crossings) are
    bit-pattern-distinct and thus hash FAILs even when values match
    (round-6 lesson: q_evt_seasonality HUGEINT->float64)."""
    k = dt.kind  # i/u int, f float, b bool, M datetime, O object
    if k in ("i", "u"):
        return "int"
    return {"f": "float", "b": "bool", "M": "datetime", "O": "object"}.get(k, k)


def dtype_mismatches(exp_df, got_df):
    """Per-column dtype-kind diffs between oracle and Spark frames."""
    diffs = []
    for c in exp_df.columns:
        ek, gk = dtype_kind(exp_df[c].dtype), dtype_kind(got_df[c].dtype)
        if ek != gk:
            diffs.append(
                f"col {c}: spark {got_df[c].dtype}({gk}) vs duck {exp_df[c].dtype}({ek})")
    return diffs


def check_hashable(con, out_dir, name):
    """Driver hashes every output — fail on array/map/struct columns."""
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') LIMIT 1")
    for d in got.description:
        tname = str(d[1])
        if any(k in tname.upper() for k in ("LIST", "STRUCT", "MAP", "[]")):
            raise ArrayCell(f"column {d[0]} has nested type {tname}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # every produced output (incl. no-oracle rows) must be driver-hashable
    outputs = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    for name in outputs:
        if only and name not in only:
            continue
        if name in oracle:
            continue  # checked below with values
        try:
            check_hashable(con, out_dir, name)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        def fetch_once(q):
            # ONE execution per query (round-8 advice): Arrow gives both
            # the pandas view (dtype check) and native-python row tuples
            # (value compare, fetchall-equivalent: Decimal/datetime/None)
            tbl = con.execute(q).arrow()
            df = tbl.to_pandas()
            cols = list(tbl.column_names)
            # build rows POSITIONALLY from the Arrow columns: to_pylist()
            # dicts are keyed by column name, so duplicate column names
            # would silently collapse to the last column's value on both
            # sides, weakening the compare (round-8 advice)
            rows = list(zip(*[col.to_pylist() for col in tbl.columns])) \
                if len(tbl.columns) else []
            return df, cols, rows

        try:
            check_hashable(con, out_dir, name)
            exp_df, exp_cols, exp_rows = fetch_once(sql)
            got_q = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got_df, got_cols, got_rows = fetch_once(got_q)
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_fail += 1
            continue
        # driver hashes pandas frames bit-pattern-sensitively: int widths
        # unify, int-vs-float (and any kind crossing) is a hash FAIL even
        # with equal values
        dt_diffs = dtype_mismatches(exp_df, got_df)
        if dt_diffs:
            print(f"FAIL {name}: dtype: " + "; ".join(dt_diffs))
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        try:
            er = [tuple(norm(r[i]) for i in eperm) for r in exp_rows]
            gr = [tuple(norm(r[i]) for i in gperm) for r in got_rows]
        except ArrayCell as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if er == gr:
            print(f"PASS {name} ({len(er)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(er) != len(gr):
                print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(er)}")
            else:
                for i, (a, b) in enumerate(zip(gr, er)):
                    if a != b:
                        print(f"FAIL {name}: first diff row {i}:\n  spark={a}\n  duck ={b}")
                        break
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


