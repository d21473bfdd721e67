#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential check.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from <out>/oracle_sql.json in DuckDB against the
same sf tables, sorts columns by name, canonicalizes values, and compares
row multisets. Prints PASS/FAIL per query.
"""
import sys, glob, json, math

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
    if isinstance(v, bool):
        return str(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    return sorted(out), [names[i] for i in order]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    # Restrict to the names the Verify invocation actually ran (its
    # manifest): a filtered run would otherwise be scored against stale
    # parquet left over from an earlier full run. No manifest (pre-r12
    # output dir) → score every oracle entry as before.
    names = sorted(oracle)
    if os.path.exists(f"{out}/manifest.json"):
        ran = set(json.load(open(f"{out}/manifest.json")))
        skipped = [n for n in names if n not in ran]
        names = [n for n in names if n in ran]
        if skipped:
            print(f"SKIP {len(skipped)} not in this run's manifest: "
                  + ",".join(skipped))
        if not names:
            # manifest ∩ oracle empty (e.g. a names-csv typo selected
            # nothing): scoring zero queries must not read as green
            print("ERROR: manifest selects zero oracle queries — nothing scored")
            sys.exit(2)
    for name in names:
        # a failure marker always loses: Verify scrubs the dir before
        # writing it, but treat its presence as authoritative so stale
        # parquet from an earlier run can never mask a regression
        if os.path.exists(f"{out}/{name}/_ERROR.txt"):
            msg = open(f"{out}/{name}/_ERROR.txt").read().strip()[:200]
            print(f"FAIL {name}: spark error: {msg}")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        s_rows, s_cols = frame_rows(tbl.column_names,
                                    [list(r.values()) for r in tbl.to_pylist()])
        try:
            cur = con.execute(oracle[name])
            d_names = [d[0] for d in cur.description]
            d_rows, d_cols = frame_rows(d_names, cur.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duckdb={d_cols}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
