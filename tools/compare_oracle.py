#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [selfJsonOut]

For each query dumped by graft.Verify:
  - if it has oracle SQL: run the SQL in DuckDB over views named after
    the parquet fixture tables, load both results, sort columns by name,
    sort rows, compare values (exact for non-floats; exact-then-1e-9
    report for floats so we can see WHERE mismatches come from).
  - else: rows-only check (>0 rows).

Besides the human-readable listing, writes a per-query JSON in the
driver's CORRECTNESS_r<N>.json shape ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) to <verifyOutDir>/
correctness_self.json (or [selfJsonOut] if given), so the round's hard
signal survives even when the driver-side artifact is lost (round 10's
CORRECTNESS_r10.json arrived empty).
"""
import json, sys, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def norm_cell(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "timestamp"):  # datetime-like
        return pd.Timestamp(v).floor("us")
    if isinstance(v, (np.integer,)):
        return int(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    results = {}
    # Per-query record in the driver's CORRECTNESS_r<N>.json shape.
    self_json = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        self_json[name] = {"rows_match": rows_match, "schema_match": schema_match,
                           "hash_match": hash_match, "spark_rows": spark_rows,
                           "oracle_rows": oracle_rows, "err": err}

    names = [os.path.basename(p) for p in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(p)]
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"NO-SPARK-OUTPUT {e}"
            record(name, err=f"no_spark_output: {e}")
            continue
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(got)}" + (" OK" if len(got) > 0 else " EMPTY!")
            record(name, spark_rows=len(got),
                   err="no_oracle" if len(got) > 0 else "no_oracle_and_empty")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            record(name, spark_rows=len(got), err=f"oracle_sql_error: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            record(name, rows_match=len(g) == len(e), schema_match=False, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e))
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} duck={len(e)}"
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(g), oracle_rows=len(e))
            continue
        bad = []
        for c in g.columns:
            gv = [norm_cell(x) for x in g[c].tolist()]
            ev = [norm_cell(x) for x in e[c].tolist()]
            def both_null(a, b):
                # None, float nan, and pandas NaT all count as null;
                # null == null (the driver's hash treats nulls as one
                # consistent token, not IEEE-NaN-unequal)
                def isnull(x):
                    try:
                        return x is None or pd.isna(x)
                    except (TypeError, ValueError):
                        return False
                return isnull(a) and isnull(b)
            exact = all((a == b) or both_null(a, b)
                        or (isinstance(a, float) and isinstance(b, float)
                            and (a == b or (math.isnan(a) and math.isnan(b))))
                        for a, b in zip(gv, ev))
            if not exact:
                # distinguish float-noise from real mismatch
                try:
                    close = all(
                        (a == b) or
                        (isinstance(a, float) and isinstance(b, float) and
                         abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
                        for a, b in zip(gv, ev))
                except TypeError:
                    close = False
                first = next((i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
                bad.append((c, "CLOSE" if close else "FAR", first))
        results[name] = "OK" if not bad else f"VALUE-MISMATCH {bad[:3]}"
        record(name, rows_match=True, schema_match=True, hash_match=not bad,
               spark_rows=len(g), oracle_rows=len(e))
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS-ONLY rows=") and v.endswith("OK"))
    for name in sorted(results):
        print(f"{results[name].split()[0]:>20}  {name}: {results[name]}")
    self_path = sys.argv[3] if len(sys.argv) > 3 else f"{out_dir}/correctness_self.json"
    with open(self_path, "w") as f:
        json.dump({k: self_json[k] for k in sorted(self_json)}, f, indent=1)
        f.write("\n")
    print(f"self-artifact: {self_path} ({len(self_json)} queries)")
    print(f"\n{n_ok}/{len(results)} green")

if __name__ == "__main__":
    main()
