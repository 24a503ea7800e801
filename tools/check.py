#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle SQL over the same parquet tables. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [--write-partial OUT.json]
                                                [--slowest-first] [query ...]
Not part of the Scala library — a builder-side test tool only.

--write-partial OUT.json : append each query's verdict to OUT.json AS IT
  COMPLETES (write-to-temp + atomic rename per query), so a budget kill or
  OOM mid-run yields the verdicts already computed instead of `{}` — the
  exact failure mode that blanked CORRECTNESS_r17.json when the replay
  outgrew the driver's time budget. Each entry records rows/schema/hash
  match plus `oracle_sec` (this query's DuckDB replay seconds) so replay
  growth is visible in the artifact before it kills the artifact.
--slowest-first : replay in descending order of the recorded replay cost
  (tools/oracle_times.json if present), so the heavy oracles run while the
  budget is freshest and a late kill only loses cheap verdicts.
"""
import sys, json, glob, hashlib, os, time, tempfile
import duckdb
import pandas as pd

args = sys.argv[1:]
partial_path = None
slowest_first = False
if "--write-partial" in args:
    i = args.index("--write-partial")
    partial_path = args[i + 1]
    del args[i:i + 2]
if "--slowest-first" in args:
    args.remove("--slowest-first")
    slowest_first = True
sfdir, outdir = args[0], args[1]
only = set(args[2:])

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

partial = {}
def record(name, verdict):
    if partial_path is None:
        return
    partial[name] = verdict
    # Temp-file + rename: the partial artifact is never observable half-written,
    # even if the process dies mid-dump of a later query.
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(partial_path) or ".", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(partial, f, indent=1)
    os.replace(tmp, partial_path)

names = sorted(oracle)
if slowest_first:
    cost_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_times.json")
    try:
        cost = json.load(open(cost_file))
        names.sort(key=lambda n: -cost.get(n, 0.0))
    except Exception:
        pass

fails = 0
for name in names:
    if only and name not in only:
        continue
    try:
        spark_df = norm(pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{outdir}/{name}/*.parquet"))],
            ignore_index=True))
    except Exception as e:
        print(f"{name}: NO SPARK OUTPUT ({e})")
        fails += 1
        record(name, {"match": False, "error": f"no spark output: {e}"})
        continue
    t0 = time.time()
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
        record(name, {"match": False, "error": f"oracle err: {e}",
                      "oracle_sec": round(time.time() - t0, 3)})
        continue
    osec = round(time.time() - t0, 3)
    rows = len(spark_df) == len(odf)
    schema = list(spark_df.dtypes) == list(odf.dtypes)
    hm = rows and schema and h(spark_df) == h(odf)
    ok = rows and schema and hm
    record(name, {"match": bool(ok), "rows": bool(rows), "schema": bool(schema),
                  "hash": bool(hm), "n_rows": len(spark_df), "oracle_sec": osec})
    if not ok:
        fails += 1
        print(f"{name}: rows={rows}({len(spark_df)}/{len(odf)}) schema={schema} hash={hm}")
        if rows and not schema:
            print("  spark:", dict(spark_df.dtypes.astype(str)))
            print("  oracle:", dict(odf.dtypes.astype(str)))
        if rows and schema and not hm:
            merged = spark_df.compare(odf) if spark_df.shape == odf.shape else None
            print(merged.head(10) if merged is not None else "shape mismatch")
    else:
        print(f"{name}: OK ({len(spark_df)} rows, oracle {osec:.2f}s)")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
