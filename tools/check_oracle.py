#!/usr/bin/env python3
"""Driver-replica correctness check: for each SparkEntry query result in
<outDir>, run its DuckDB oracle SQL over the raw testdata parquet and
compare (columns sorted by name, rows sorted, exact values).

Usage: check_oracle.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v!r}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        gsql = f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        got_types = dict(r[:2] for r in con.execute(f"DESCRIBE {gsql}").fetchall())
        exp_types = dict(r[:2] for r in con.execute(f"DESCRIBE ({sql})").fetchall())
        got = con.execute(gsql).fetchall()
        got_cols = [d[0] for d in con.description]
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema mismatch spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            fails += 1
            continue
        # TYPED comparison: the driver's hasher distinguishes DuckDB's
        # HUGEINT (un-cast SUM, int128) from Spark's BIGINT even when
        # values match — the round-4 q53 miss. It does NOT distinguish
        # within the ≤64-bit signed int family (q07/q12/q14/q15 were
        # hash-green in r04 with INT32 vs BIGINT), so fold that family to
        # one canonical name and flag everything else.
        def fam(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        tdiff = {c: (got_types[c], exp_types[c]) for c in got_cols
                 if fam(got_types[c]) != fam(exp_types[c])}
        if tdiff:
            print(f"FAIL {name}: column TYPE mismatch (spark, oracle): {tdiff}")
            fails += 1
            continue
        g, e = canon(got, got_cols), canon(exp, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            fails += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    except Exception as ex:
        print(f"ERR  {name}: {ex}")
        fails += 1

# rows-only checks for queries without oracle
import os
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if os.path.isdir(p) and name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only, {n} rows")
            if n == 0: fails += 1
        except Exception as ex:
            print(f"ERR  {name}: {ex}"); fails += 1

sys.exit(1 if fails else 0)
