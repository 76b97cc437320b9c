#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB over the same fixture tables, and compares: row count, column
names (sorted), and values (rows sorted canonically, doubles compared
both exactly-as-written and with 1e-9 relative slack so we can see
whether a mismatch is semantic or float noise).

This is builder-side tooling only — not part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(int(v)))
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return (2, "nan")
        return (2, repr(f))
    return (3, str(v))


def rows_key(rows):
    return sorted([tuple(canon(v) for v in r) for r in rows])


def approx_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if abs(va - vb) > 1e-6 * max(1.0, abs(va), abs(vb)):
                    return False
            elif va != vb:
                return False
    return True


def norm_type(t):
    """Collapse naming/physical-encoding variants that the driver's
    value hash does NOT distinguish, so the gate only fires on real
    width/family mismatches (HUGEINT vs BIGINT included)."""
    t = t.upper()
    # Spark writes isAdjustedToUTC timestamps; the session TZ is UTC on
    # both sides, so TIMESTAMP WITH TIME ZONE == TIMESTAMP here.
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return {"INTEGER": "INT", "VARCHAR": "TEXT", "BLOB": "BINARY"}.get(t, t)


def col_types(con, sql):
    return {r[0]: norm_type(r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; Spark-written synth fixtures
        # (tools/SynthScale) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            got = con.execute(spark_sql).fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            got_types = col_types(con, spark_sql)
            exp_types = col_types(con, f"({sql})")
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # type-parity gate: the driver's hash is TYPE-SENSITIVE, so a
        # value-exact result with sum()->HUGEINT in the oracle still
        # ships red. Catch it here.
        mismatch = {c: (got_types[c], exp_types[c]) for c in got_types
                    if got_types[c] != exp_types.get(c, got_types[c])}
        if mismatch:
            print(f"FAIL {name}: column TYPE mismatch (spark, oracle): {mismatch}")
            n_fail += 1
            continue
        # align column order by sorted name
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = [tuple(r[i] for i in gi) for r in got]
        e = [tuple(r[i] for i in ei) for r in exp]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if rows_key(g) == rows_key(e):
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif approx_equal(sorted(g, key=rows_key_one), sorted(e, key=rows_key_one)):
            print(f"SOFT {name}: hash-exact FAILS, float-tolerant passes "
                  f"({len(g)} rows) — tighten rounding!")
            n_fail += 1
        else:
            print(f"FAIL {name}: value mismatch; first diffs:")
            sg, se = sorted(g, key=rows_key_one), sorted(e, key=rows_key_one)
            shown = 0
            for rg, re_ in zip(sg, se):
                if rows_key([rg]) != rows_key([re_]):
                    print(f"  got {rg}\n  exp {re_}")
                    shown += 1
                    if shown >= 3:
                        break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def rows_key_one(r):
    return tuple(canon(v) for v in r)


if __name__ == "__main__":
    main()
