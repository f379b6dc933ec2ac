#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = views over the same
parquet dir), and compares: schema (column names), row count, and a hash
of values with columns sorted by name (rows compared in order AND as a
sorted multiset, so we catch both kinds of mismatch).
"""
import json, sys, math, glob, os
from decimal import Decimal
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    # canonicalize every numeric through float so a double-vs-decimal type
    # divergence between Spark parquet and the oracle can't produce
    # trailing-zero formatting FAILs ('123.4' vs '123.40')
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and print with repr for full precision
        if v == 0.0:
            v = 0.0
        return repr(v)
    return str(v)

def table(con, rel_sql):
    rows = con.execute(rel_sql).fetchall()
    cols = [d[0] for d in con.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # bound oracle CPU so a background check can't pollute a concurrent
    # bench (DUCKDB_THREADS unset = all cores, the default)
    _t = os.environ.get("DUCKDB_THREADS")
    if _t:
        con.execute(f"SET threads={int(_t)}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # GenScale fixtures are multi-file parquet DIRECTORIES; the driver
        # fixtures are single files — glob the former
        p = f"{sf_dir}/{t}.parquet"
        # partial fixtures (GenScale table-subset mode) omit tables the
        # checked queries never read — skip the view, fail only if an
        # oracle actually references it
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    n_pass = n_fail = 0
    names = sorted(oracles.keys())
    for name in names:
        try:
            got_cols, got = table(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            exp_cols, exp = table(con, oracles[name])
            # The DRIVER's fetch path does not canonicalize int128/decimal the
            # way norm() does (r3: HUGEINT sums hashed as floats → q74/q87
            # red while this replica passed). Refuse driver-unsafe types on
            # BOTH sides: oracle HUGEINT/DECIMAL (DuckDB sum(int), bare
            # decimal literals) AND Spark DECIMAL parquet (a bare `100.0` in
            # selectExpr SQL text is DECIMAL(4,1) — use 100.0D).
            exp_desc = {c: ty for c, ty, *_ in
                        con.execute(f"DESCRIBE ({oracles[name]})").fetchall()}
            got_desc = {c: ty for c, ty, *_ in
                        con.execute(f"DESCRIBE (SELECT * FROM '{out_dir}/{name}/*.parquet')").fetchall()}
            bad = [("oracle", c, ty) for c, ty in exp_desc.items()
                   if ty.startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))]
            bad += [("spark", c, ty) for c, ty in got_desc.items()
                    if ty.startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))]
            if bad:
                print(f"FAIL {name}: driver-unsafe column types {bad} "
                      f"(CAST sums to BIGINT; double literals: SQL-text 1.0D)")
                n_fail += 1
                continue
            # r12 lesson (q445): the DRIVER pandas-sorts final outputs and
            # cannot hash list/struct/map cells — refuse nested types on
            # either side (DuckDB spells them 'T[]', 'STRUCT(...)', 'MAP(...)').
            nested = [(side, c, ty) for side, desc in
                      (("oracle", exp_desc), ("spark", got_desc))
                      for c, ty in desc.items()
                      if "[]" in ty or ty.startswith(("STRUCT", "MAP", "LIST", "UNION"))]
            if nested:
                print(f"FAIL {name}: nested output columns {nested} — the "
                      f"driver's pandas sorter cannot hash them; to_json both sides")
                n_fail += 1
                continue
            # r12 lesson (q462-464): the DRIVER's hasher is dtype-sensitive;
            # FLOAT4 on one side vs DOUBLE on the other hash-diverges even
            # for equal values. Refuse float-width mismatches per column.
            fmix = [(c, exp_desc.get(c), got_desc.get(c)) for c in got_desc
                    if c in exp_desc
                    and {exp_desc[c], got_desc[c]} == {"FLOAT", "DOUBLE"}]
            if fmix:
                print(f"FAIL {name}: float-width mismatch {fmix} — driver "
                      f"hash is dtype-sensitive; spell the oracle ::FLOAT4 or "
                      f"cast the engine column to double")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        if got == exp:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif sorted(got) == sorted(exp):
            print(f"WARN {name}: set-equal but ORDER differs")
            n_fail += 1
        else:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"FAIL {name}: value diffs (first 3): {diffs}")
            n_fail += 1
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass / {n_fail} fail of {len(names)} oracled")
    sys.exit(1 if n_fail else 0)

main()
