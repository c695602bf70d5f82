#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's outputs
against the DuckDB oracle SQL and compare (columns sorted by name, doubles
rounded, row sets compared; order reported separately).

Usage: duck_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cursor_like):
    cols = [d[0] for d in cursor_like.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in cursor_like.fetchall():
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got_cols, got = rows_of(con.execute(
                f"SELECT * FROM read_parquet({files!r})"))
            want_cols, want = rows_of(con.execute(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} vs {want_cols}")
            n_fail += 1
            continue
        ok_set = sorted(map(repr, got)) == sorted(map(repr, want))
        ok_order = got == want
        if ok_set:
            n_pass += 1
            print(f"PASS {name}: {len(got)} rows" +
                  ("" if ok_order else "  (row order differs)"))
        else:
            n_fail += 1
            gs, ws = set(map(repr, got)), set(map(repr, want))
            only_g, only_w = list(gs - ws)[:3], list(ws - gs)[:3]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows; "
                  f"extra={only_g} missing={only_w}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
