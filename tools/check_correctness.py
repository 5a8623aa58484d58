"""Local replica of the driver's correctness gate.

Runs every queries()[name] on Spark at sf0.01 and the matching
oracle_sql()[name] in DuckDB on the same parquet; compares row count,
column names (sorted), and values (rows sorted by all columns) — the same
order-insensitive discipline the driver uses, with exact float equality
reported (we design for exactness) plus a 1e-9 tolerance fallback flag.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = norm(spark_pdf), norm(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            if np.array_equal(av, bv, equal_nan=True):
                continue
            md = np.nanmax(np.abs(av - bv))
            return (f"VALUES col={c} max_abs_diff={md:.3e}"
                    + (" (within 1e-9)" if md < 1e-9 else ""))
        if not np.array_equal(av, bv):
            i = int(np.nonzero(av != bv)[0][0])
            return f"VALUES col={c} first_diff row {i}: {av[i]!r} vs {bv[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from sgspark.session import get_spark
    spark = get_spark("correctness", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:24s} SPARK-ERROR {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows "
                  f"({t1 - t0:.1f}s spark)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name:24s} DUCK-ERROR {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        status = "OK " if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{name:24s} {status} {verdict if verdict != 'OK' else ''} "
              f"rows={len(sdf)} ({t1 - t0:.1f}s spark, "
              f"{time.time() - t1:.1f}s duck)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
