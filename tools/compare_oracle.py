#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate: run each oracle SQL
against the testdata parquet, load the corresponding Verify parquet output,
sort columns by name + rows by all columns, and compare values."""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        results[name] = "MISSING_SPARK_OUTPUT"
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        results[name] = f"SCHEMA_NAMES: oracle={list(exp.columns)} spark={list(got.columns)}"
        continue
    if len(exp) != len(got):
        results[name] = f"ROWCOUNT: oracle={len(exp)} spark={len(got)}"
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        # Date/timestamp columns: parquet DATE loads into pandas as object
        # (datetime.date) while DuckDB yields datetime64 — a pandas artifact,
        # not an engine mismatch (the driver canonicalizes both). Normalize
        # and compare as datetimes.
        if e.dtype.kind == "M" or g.dtype.kind == "M":
            try:
                e2, g2 = pd.to_datetime(e), pd.to_datetime(g)
                # paired NaT (legitimately-null timestamps in both engines,
                # e.g. outer-join null purchase_ts) compare equal — element-
                # wise == on NaT is False (ADVICE r4)
                eq = (e2.isna() & g2.isna()).values | (e2.values == g2.values)
                if not eq.all():
                    mismatch.append(f"{c}:{int((~eq).sum())}rows")
            except Exception as ex:
                mismatch.append(f"{c}:cmp_error:{ex}")
            continue
        # Dtype-strict: the driver hashes canonicalized values, so an oracle
        # HUGEINT (object/float in pandas) vs a Spark BIGINT hash-mismatches even
        # when the numbers are equal. Fail here on any dtype-kind difference so
        # this local gate predicts the driver gate.
        if e.dtype.kind != g.dtype.kind:
            mismatch.append(f"{c}:dtype:oracle={e.dtype}({e.dtype.kind}) spark={g.dtype}({g.dtype.kind})")
            continue
        try:
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                # BIT-exact: the driver hashes canonicalized values, where
                # -0.0 != +0.0 (the r10 q_volatility escape: np.isclose
                # treats them equal, the driver's hash does not). Compare
                # raw float64 bits; paired NaN counts as equal.
                ev = e.astype(np.float64).values
                gv = g.astype(np.float64).values
                eq = (ev.view(np.int64) == gv.view(np.int64)) | \
                     (np.isnan(ev) & np.isnan(gv))
                if not eq.all():
                    bad = ~eq
                    sz = int((bad & (ev == gv)).sum())  # signed-zero-only cells
                    tag = f" ({sz} signed-zero)" if sz else ""
                    mismatch.append(f"{c}:{int(bad.sum())}rows{tag}")
            else:
                eq = e.astype(str).values == g.astype(str).values
                if not eq.all():
                    mismatch.append(f"{c}:{int((~eq).sum())}rows")
        except Exception as ex:
            mismatch.append(f"{c}:cmp_error:{ex}")
    results[name] = "OK" if not mismatch else f"VALUES: {mismatch}"

npass = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(f"{'PASS' if v == 'OK' else 'FAIL'} {name}" + ("" if v == "OK" else f"  {v}"))
print(f"\n{npass}/{len(results)} oracle queries pass")
