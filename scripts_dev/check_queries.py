"""Local dual-oracle harness: run every registry query in Spark AND DuckDB,
compare row count, schema names, and order-insensitive values (mimics the
driver's CORRECTNESS check). Usage:

    python scripts_dev/check_queries.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from etl_geo_dem_spark.queries import REGISTRY  # noqa: E402
from etl_geo_dem_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # lists/arrays → tuples for hashing
            df[c] = s.map(lambda v: tuple(np.round(v, 6)) if isinstance(v, (list, np.ndarray)) else v)
        elif np.issubdtype(s.dtype, np.number):
            # HUGEINT→float64 vs int64: coerce all numerics to rounded float64
            df[c] = pd.to_numeric(s, errors="coerce").astype("float64").round(6)
        elif np.issubdtype(s.dtype, np.datetime64):
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(list(df.columns), ignore_index=True, key=lambda s: s.astype(str))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.001"
    filters = [a for a in sys.argv[1:] if "/" not in a]
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, q in sorted(REGISTRY.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            got = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name:38s} SPARK ERROR: {str(e).splitlines()[0][:120]}")
            n_fail += 1
            continue
        if q.oracle is None:
            ok = len(got) >= 0
            print(f"rows  {name:38s} rows={len(got)} (no oracle) {time.time()-t0:5.1f}s")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL  {name:38s} DUCKDB ERROR: {str(e).splitlines()[0][:120]}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rowcount spark={len(got)} duck={len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"schema spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        else:
            # strict dtype audit: the driver's value hash is dtype-sensitive
            # (int64 vs HUGEINT-as-object, int32 vs int64, int vs float all
            # hash differently) — the canon() coercion below would mask these.
            for c in got.columns:
                gk, ek = got[c].dtype, exp[c].dtype
                if gk != ek and len(got) > 0:
                    # datetime64 resolution differences (ns vs us) are benign:
                    # driver-green in round 1 for cdc_lww_latest_window et al.
                    both_dt = np.issubdtype(gk, np.datetime64) and np.issubdtype(
                        ek, np.datetime64
                    )
                    both_obj = gk == object and ek == object
                    if not (both_dt or both_obj):
                        problems.append(f"dtype[{c}] spark={gk} duck={ek}")
        if not problems:
            cg, ce = canon(got), canon(exp)
            try:
                eq = cg.astype(str).equals(ce.astype(str))
            except Exception:
                eq = False
            if not eq:
                diff_at = None
                for i in range(min(len(cg), len(ce))):
                    if not cg.iloc[i].astype(str).equals(ce.iloc[i].astype(str)):
                        diff_at = i
                        break
                problems.append(
                    f"values differ (first diff row {diff_at}):\n  spark: {cg.iloc[diff_at].to_dict() if diff_at is not None else '?'}\n  duck : {ce.iloc[diff_at].to_dict() if diff_at is not None else '?'}"
                )
        if problems:
            print(f"FAIL  {name:38s} " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name:38s} rows={len(got)} {time.time()-t0:5.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
