#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Runs each oracle_sql.json query in DuckDB over the sf tables, loads the
Spark parquet dump, sorts columns by name, canonicalizes values, and
compares row multisets. Usage:
    python tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft-verify-out
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.9g}")
            elif isinstance(v, pd.Timestamp):
                row.append(v.floor("us").isoformat())
            elif isinstance(v, bool):
                row.append(str(bool(v)).lower())
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE", "REAL"}

def duck_kind(t: str) -> str:
    t = t.upper()
    if t in INT_TYPES: return "int"
    if t in FLOAT_TYPES or t.startswith("DECIMAL"): return "float"
    return "other"

def arrow_kind(t) -> str:
    import pyarrow as pa
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t): return "float"
    return "other"

def dtype_mismatches(spark_tbl, sql: str) -> list:
    """int-vs-float divergences the canon fold (%.9g) would mask.

    The driver hashes raw values, so oracle 52.0 vs spark 52 is red
    there even though both canonicalize to "52" here. Compare the
    declared kinds (arrow schema vs DuckDB DESCRIBE) and fail loudly
    when one side is integer and the other float.
    """
    skinds = {f.name: arrow_kind(f.type) for f in spark_tbl.schema}
    okinds = {r[0]: duck_kind(r[1])
              for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
    bad = []
    for c in skinds:
        sk, ok = skinds[c], okinds.get(c)
        if ok is None: continue
        if {sk, ok} == {"int", "float"}:
            bad.append(f"{c}: spark={sk} oracle={ok}")
    return bad

fails = 0
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name} (no spark output)"); fails += 1; continue
    try:
        stbl = pq.read_table(spark_path)
        sdf = stbl.to_pandas()
        odf = con.execute(oracle[name]).fetchdf()
        kind_bad = dtype_mismatches(stbl, oracle[name])
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fails += 1; continue
    s, o = canon(sdf), canon(odf)
    cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
    if cols_s != cols_o:
        print(f"SCHEMA   {name}: spark={cols_s} oracle={cols_o}"); fails += 1
    elif kind_bad:
        print(f"DTYPE    {name}: {'; '.join(kind_bad)}"); fails += 1
    elif s == o:
        print(f"OK       {name} ({len(s)} rows)")
    else:
        print(f"MISMATCH {name}: spark {len(s)} rows vs oracle {len(o)} rows")
        only_s = [r for r in s if r not in set(o)][:3]
        only_o = [r for r in o if r not in set(s)][:3]
        print(f"  spark-only: {only_s}")
        print(f"  oracle-only: {only_o}")
        fails += 1

extra = [os.path.basename(p) for p in glob.glob(f"{out_dir}/q*")
         if os.path.basename(p) not in oracle]
if extra:
    print(f"(rows-only queries, no oracle: {sorted(extra)})")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
