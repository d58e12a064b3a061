"""Simulate the driver's t2 gate: vanilla SparkSession (none of the engine's
tuned configs), every queries() entry vs its DuckDB oracle, order-insensitive
value hash over name-sorted columns. Env GATE_SF overrides the scale dir
(default sf0.01; run sf0.1 too before shipping — data-dependent divergences
like frame-boundary ties only surface with more data)."""
import sys, os, hashlib, math, datetime as dt
sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np, pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("GATE_SF", "/root/testdata/sf0.01")
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False, name=None):
        cells = []
        for x in row:
            if x is None or (isinstance(x, float) and math.isnan(x)): cells.append("∅")
            elif isinstance(x, (np.floating, float)):
                v = float(x); cells.append("∅" if math.isnan(v) else repr(v))
            elif isinstance(x, (np.integer, int)): cells.append(str(int(x)))
            elif isinstance(x, (np.bool_, bool)): cells.append(str(bool(x)))
            elif isinstance(x, (pd.Timestamp, dt.datetime, dt.date)): cells.append(x.isoformat())
            else: cells.append(str(x))
        out.append("|".join(cells))
    return hashlib.md5("\n".join(sorted(out)).encode()).hexdigest(), len(out)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

only = {n for n in os.environ.get("GATE_ONLY", "").split(",") if n}
fails, errs, n_pass, n_rows_only = [], [], 0, 0
for name in sorted(qs):
    if only and name not in only:
        continue
    # per-query isolation: one crashing plan must not abort the run and
    # silently leave everything after it unchecked (round-2 post-mortem:
    # wx_range_frame's AnalysisException hid 4 real streaming failures)
    try:
        sdf = qs[name](spark, SF).toPandas()
        spark.catalog.clearCache()  # bound cache growth across cache-building queries
        if name not in osql:
            n_rows_only += 1
            print("ROWS-ONLY", name, f"rows={len(sdf)}", flush=True)
            continue
        odf = con.execute(osql[name]).fetchdf()
        hs, ns = canon(sdf); ho, no = canon(odf)
        ok = hs == ho and ns == no
        if ok: n_pass += 1
        else: fails.append(name)
        print(("PASS" if ok else "FAIL"), name, f"rows={ns}/{no}", flush=True)
    except Exception as exc:
        errs.append(name)
        msg = str(exc).splitlines()[0][:200] if str(exc) else type(exc).__name__
        print("ERR ", name, f"err={type(exc).__name__}: {msg}", flush=True)
unknown = sorted(only - set(qs)) if only else []
if unknown:
    # a typo'd GATE_ONLY must never read as a green gate
    print("UNKNOWN (not in registry, not run):", unknown)
n_run = len(only & set(qs)) if only else len(qs)
print("TOTAL", n_run, "PASS", n_pass, "ROWS-ONLY", n_rows_only,
      "FAILS", fails, "ERRS", errs)
sys.exit(1 if (fails or errs or unknown) else 0)
