"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the
same parquet fixtures, then compares row count, schema (arrow-level
dtypes, column names sorted) and order-insensitive values. Strictly
harsher than the driver's hash check: we diff actual values.

Usage:
  python tools/check_correctness.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from heroku_kafka_connect_spark.registry import all_queries, resolve_oracle  # noqa: E402
from heroku_kafka_connect_spark.session import TABLES, get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array-valued cells (numpy arrays / lists) are unhashable and
    # unsortable — canonicalize to tuples first
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
            df[c] = df[c].map(lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v) if v is not None and not isinstance(v, (str, bytes)) else v)
    # canonical row order for value diffing (driver hashes order-insensitively)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    sn, dn = normalize(spark_pdf), normalize(duck_pdf)
    for c in sn.columns:
        sd, dd = str(sn[c].dtype), str(dn[c].dtype)
        if sd != dd:
            problems.append(f"dtype[{c}] spark={sd} duck={dd}")
    if problems:
        return problems
    if len(sn) == len(dn):
        for c in sn.columns:
            a, b = sn[c], dn[c]
            try:
                if a.dtype == object:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                nbad = int(neq.sum())
            except Exception as e:  # noqa: BLE001
                problems.append(f"value-compare[{c}] failed: {e}")
                continue
            if nbad:
                idx = neq[neq].index[:3]
                examples = [(c, i, a[i], b[i]) for i in idx]
                problems.append(f"values[{c}]: {nbad} mismatches, e.g. {examples}")
    return problems


def run_corpus(sf_dir: str, names: list[str] | None = None, spark=None, results: dict | None = None):
    """Programmatic entry (pytest -m corpus uses this): run every
    registered query vs its oracle at ``sf_dir``; returns
    (n_pass, n_fail, n_rows_only, failures). When ``results`` is a
    dict, a per-query record is stored in it (for ``--json``
    snapshot artifacts, e.g. CORRECTNESS_FULL_r07.json)."""
    qs = all_queries()
    names = names or sorted(qs)
    spark = spark or get_spark("check-correctness")
    con = duck_con(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        if name not in qs:
            print(f"?? {name}: not registered")
            continue
        q = qs[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            if results is not None:
                results[name] = {"status": "fail", "err": "spark raised"}
            continue
        oracle = resolve_oracle(q.oracle, sf_dir)
        if not oracle:
            n_rows_only += 1
            print(f"rows {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
            if results is not None:
                results[name] = {"status": "rows_only", "rows": len(spark_pdf), "sec": round(time.time() - t0, 2)}
            continue
        try:
            duck_pdf = con.execute(oracle).df()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            if results is not None:
                results[name] = {"status": "fail", "err": "duckdb raised"}
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name} ({time.time() - t0:.1f}s):")
            for p in problems:
                print(f"   - {p}")
            if results is not None:
                results[name] = {"status": "fail", "problems": [str(p)[:300] for p in problems]}
        else:
            n_pass += 1
            print(f"ok   {name}: {len(spark_pdf)} rows ({time.time() - t0:.1f}s)")
            if results is not None:
                results[name] = {"status": "pass", "rows": len(spark_pdf), "sec": round(time.time() - t0, 2)}

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if failures:
        print("failures:", " ".join(failures))
    return n_pass, n_fail, n_rows_only, failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--json", default=None, help="write a full per-query snapshot (committed as CORRECTNESS_FULL_r*.json)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    results: dict | None = {} if args.json else None
    n_pass, n_fail, n_rows_only, _ = run_corpus(args.sf, args.names or None, results=results)
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf,
                    "checker": "tools/check_correctness.py (value-diff, harsher than driver hash)",
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "queries": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
