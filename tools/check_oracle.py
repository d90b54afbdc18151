#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate: runs each
SparkEntry.oracleSql query in DuckDB over the sf testdata tables and
compares (schema-sorted, row-sorted, rounded) against the parquet dumps
written by graft.Verify. Usage:

  python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb

def norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)

def main(out_dir, sf_dir):
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        got_rows = got.to_pylist()
        if name not in oracles:
            print(f"  rows-only {name}: {len(got_rows)} rows "
                  f"({'OK' if got_rows else 'EMPTY!'})")
            continue
        exp = con.execute(oracles[name]).fetch_arrow_table()
        exp_rows = exp.to_pylist()
        gc, ec = sorted(got.column_names), sorted(exp.column_names)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_bad += 1; continue
        g, e = norm(got_rows, gc), norm(exp_rows, ec)
        if g == e:
            print(f"  ok {name}: {len(g)} rows"); n_ok += 1
        else:
            only_g = [x for x in g if x not in set(e)][:3]
            only_e = [x for x in e if x not in set(g)][:3]
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; "
                  f"spark-only={only_g} oracle-only={only_e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
