#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle compare.

NOT part of the engine (engine = Scala Spark only). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Verify.scala output) and the dumped
oracle_sql.json, runs the oracle SQL in DuckDB over the same sf tables,
and compares row count, column names, and values (columns sorted by
name, rows compared in emitted order — queries must ORDER BY).
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    # queries that failed to RUN leave no output dir — name them instead
    # of letting them vanish from the report (the round-9 failure mode).
    # Also EXCLUDE them from the dir walk: a reused outDir can hold a
    # stale passing dump from a previous run of the now-broken query,
    # which would double-report it as both did-not-run and ok.
    err_path = os.path.join(out_dir, "verify_errors.json")
    if os.path.exists(err_path):
        errs = json.load(open(err_path))
        for name, msg in errs.items():
            print(f"FAIL {name}: did not run: {msg[:160]}")
            n_bad += 1
        names = [n for n in names if n not in errs]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_bad += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        if name not in oracle:
            print(f"ok   {name}: rows-only check, {len(got)} rows"
                  + ("  ** EMPTY **" if len(got) == 0 else ""))
            n_ok += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_bad += 1; continue
        import pandas as pd
        # Driver's hash compare distinguishes 0 from 0.0 — a DuckDB
        # HUGEINT (e.g. sum(BIGINT)) fetches as float64 and hash-fails
        # against a Spark long even when numerically equal. Flag kind
        # mismatches (int vs float) as failures here too.
        kind_bad = [c for c in got.columns
                    if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}]
        if kind_bad:
            print(f"FAIL {name}: int-vs-float dtype mismatch on {kind_bad} "
                  f"(cast the oracle column to BIGINT)")
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), exp.reset_index(drop=True),
                check_dtype=False, check_exact=True)
            print(f"ok   {name}: {len(got)} rows exact-match")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch:\n{str(e)[:800]}")
            print("  spark:", got.head(3).to_dict("records"))
            print("  duck :", exp.head(3).to_dict("records"))
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
