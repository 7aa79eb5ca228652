#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare each Verify output
parquet against the DuckDB oracle on the same tables. Sorts columns by name,
sorts rows, compares values (exact; floats via repr equality)."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    d = f"{out_dir}/{name}"
    try:
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"; continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        duck_df = con.execute(sql).df()
        sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
        if sc != dc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} duck={dc}"; continue
        s = spark_df[sc].sort_values(sc).reset_index(drop=True)
        k = duck_df[dc].sort_values(dc).reset_index(drop=True)
        if len(s) != len(k):
            results[name] = f"ROWCOUNT spark={len(s)} duck={len(k)}"; continue
        # dtype check (loose: compare kind after normalization)
        mism = []
        for c in sc:
            a, b = s[c], k[c]
            try:
                # normalize date/datetime representation drift (pandas shows
                # DuckDB DATE as datetime64; Spark DATE as object of date)
                if str(a.dtype).startswith('datetime64') or str(b.dtype).startswith('datetime64'):
                    a = pd.to_datetime(a); b = pd.to_datetime(b)
                eq = (a.fillna('__N__') == b.fillna('__N__')) if a.dtype == object \
                     else ((a == b) | (a.isna() & b.isna()))
                if not eq.all():
                    idx = (~eq).idxmax()
                    mism.append(f"{c}[{idx}]: {a[idx]!r} vs {b[idx]!r} (dtypes {a.dtype}/{b.dtype})")
            except Exception as e:
                mism.append(f"{c}: compare error {e} (dtypes {a.dtype}/{b.dtype})")
        if mism:
            results[name] = "VALUE_MISMATCH " + "; ".join(mism[:3])
        else:
            # type strictness note
            tn = [f"{c}:{s[c].dtype}/{k[c].dtype}" for c in sc if str(s[c].dtype) != str(k[c].dtype)]
            results[name] = "OK" + (f" (dtype-drift {tn})" if tn else "")
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {e}"

ok = sum(1 for v in results.values() if v.startswith("OK"))
for name, v in sorted(results.items()):
    print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {name}: {v}")
print(f"\n{ok}/{len(results)} pass")
sys.exit(0 if ok == len(results) else 1)
