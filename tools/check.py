#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle SQL over the same parquet tables. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
Not part of the Scala library — a builder-side test tool only.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def fresh_con():
    # A connection per query: one long-lived connection accumulates enough
    # allocator state over 180+ sf0.1 oracle replays that DuckDB starts
    # failing tiny allocations late in the run (observed: spurious OOMs
    # from x86 onward that disappear entirely run solo).
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return c

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], datetime.date):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        spark_df = norm(pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{outdir}/{name}/*.parquet"))],
            ignore_index=True))
    except Exception as e:
        print(f"{name}: NO SPARK OUTPUT ({e})")
        fails += 1
        continue
    try:
        # close() in finally: a throwing oracle query must not leak the
        # connection and its ten views, or a run with many oracle errors
        # re-accumulates exactly the allocator state fresh_con() avoids.
        con = fresh_con()
        try:
            odf = norm(con.sql(oracle[name]).df())
        finally:
            con.close()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fails += 1
        continue
    rows = len(spark_df) == len(odf)
    schema = list(spark_df.dtypes) == list(odf.dtypes)
    hm = rows and schema and h(spark_df) == h(odf)
    status = "OK" if (rows and schema and hm) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name}: rows={rows}({len(spark_df)}/{len(odf)}) schema={schema} hash={hm}")
        if rows and not schema:
            print("  spark:", dict(spark_df.dtypes.astype(str)))
            print("  oracle:", dict(odf.dtypes.astype(str)))
        if rows and schema and not hm:
            merged = spark_df.compare(odf) if spark_df.shape == odf.shape else None
            print(merged.head(10) if merged is not None else "shape mismatch")
    else:
        print(f"{name}: OK ({len(spark_df)} rows)")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
