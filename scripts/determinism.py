#!/usr/bin/env python3
"""Run-to-run determinism audit for the graded gate.

Usage: python3 scripts/determinism.py <verifyOutDirA> <verifyOutDirB>

Compares two independent `graft.Verify` runs of the SAME code at the
SAME SF, query by query. The driver's oracle compare is in-order and
value-exact (modulo round(_, 9)), so any run-to-run instability —
float partial-sum merge order crossing a round() grid, a sort that is
not total breaking ties differently, an unseeded sample — would make
the gate flake even though a single run passes. This audit catches
that class empirically.

Also supported (and run in round 4): CROSS-PARALLELISM comparison —
one Verify at the default 32 threads vs one at SPARK_GRAFT_CPUS=7.
Different partitioning reorders ties and float partial-sum merges
that same-config reruns cannot perturb, so a clean cross-parallelism
pass is the stronger totality witness (226 stable / 0 diverged on
round-4 HEAD at sf0.01).

The query set is the UNION of both dirs: Verify skips a query that
throws, so a one-sided absence is an intermittent crash — the worst
flake class — and must FAIL, not fall out of the comparison. Columns
are compared positionally (same code wrote both runs, so any column
order or name difference is itself a divergence; name-sorting would
also mask a duplicate-named column). Oracle-checked queries (present
in oracle_sql.json) are compared IN ORDER, exactly like the driver.
No-oracle outputs (streaming, sketches, sinks) are compared as sorted
multisets: their row order is not graded, but their values should
still be stable.
"""
import json, os, sys
import duckdb


def rows_of(con, out_dir, name):
    cur = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    cols = [d[0] for d in cur.description]
    return cols, [tuple(repr(v) for v in r) for r in cur.fetchall()]


def main():
    if len(sys.argv) < 3:
        print("usage: determinism.py <verifyOutDirA> <verifyOutDirB>")
        sys.exit(2)
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # A Verify run that crashed before writing oracle_sql.json is itself
    # the intermittent-failure class this audit exists to catch — report
    # it as a structured FAIL, not an unhandled traceback.
    oracle = None
    for d in (dir_a, dir_b):
        try:
            with open(f"{d}/oracle_sql.json") as f:
                oracle = set(json.load(f))
            break
        except (OSError, ValueError) as e:
            print(f"FAIL oracle_sql.json: unreadable in {d}: {e} — "
                  "Verify run died before finishing")
    if oracle is None:
        print("== determinism: 0 stable, 1 diverged ==")
        sys.exit(1)

    def outputs(d):
        if not os.path.isdir(d):
            # a missing run dir = that Verify run never started/finished;
            # every query the other side wrote becomes a one-sided FAIL
            print(f"FAIL {d}: run directory missing")
            return set()
        return set(n for n in os.listdir(d)
                   if os.path.isdir(os.path.join(d, n)))

    names_a, names_b = outputs(dir_a), outputs(dir_b)
    n_pass = n_fail = 0
    for name in sorted(names_a | names_b):
        if name not in names_a or name not in names_b:
            side = dir_b if name not in names_b else dir_a
            print(f"FAIL {name}: missing from {side} — intermittent failure")
            n_fail += 1
            continue
        try:
            ca, ra = rows_of(con, dir_a, name)
            cb, rb = rows_of(con, dir_b, name)
        except Exception as e:
            print(f"FAIL {name}: read error: {e}")
            n_fail += 1
            continue
        ordered = name in oracle
        if not ordered:
            ra, rb = sorted(ra), sorted(rb)
        if ca != cb:
            print(f"FAIL {name}: cols {ca} vs {cb}")
            n_fail += 1
        elif ra == rb:
            n_pass += 1
        else:
            n_fail += 1
            if len(ra) != len(rb):
                print(f"FAIL {name}: rowcount {len(ra)} vs {len(rb)}")
            else:
                for i, (x, y) in enumerate(zip(ra, rb)):
                    if x != y:
                        kind = "in-order" if ordered else "sorted"
                        print(f"FAIL {name}: first {kind} diff row {i}:\n  A={x}\n  B={y}")
                        break
    print(f"== determinism: {n_pass} stable, {n_fail} diverged ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
