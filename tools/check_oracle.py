"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

TOL = float(os.environ.get("ORACLE_TOL", "1e-9"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} != {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            aa = pd.to_numeric(a[c], errors="coerce").values.astype(float)
            bb = pd.to_numeric(b[c], errors="coerce").values.astype(float)
            both_nan = np.isnan(aa) & np.isnan(bb)
            if not np.all(both_nan | (np.abs(aa - bb) <= TOL)):
                i = int(np.argmax(~(both_nan | (np.abs(aa - bb) <= TOL))))
                return f"VALUES col={c} row={i}: {aa[i]!r} != {bb[i]!r}"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                i = int(np.argmax(av.astype(str) != bv.astype(str)))
                return f"VALUES col={c} row={i}: {av[i]!r} != {bv[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from drain3_spark.session import get_spark
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from "
                f"parquet_scan('{sf_dir}/{t}.parquet')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:26s} SPARK-ERROR {type(e).__name__}: {str(e).splitlines()[0][:90]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name:26s} rows-only   {len(sdf)} rows  {time.time()-t0:.1f}s")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:26s} DUCK-ERROR  {str(e).splitlines()[0][:90]}")
            n_bad += 1
            continue
        verdict = compare(sdf, ddf)
        mark = "OK " if verdict == "OK" else "BAD"
        if verdict == "OK":
            n_ok += 1
        else:
            n_bad += 1
        print(f"{name:26s} {mark}  {len(sdf):6d} rows  {time.time()-t0:5.1f}s  {verdict if verdict != 'OK' else ''}")
    print(f"\n{n_ok} OK, {n_bad} BAD, {n_rows_only} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
