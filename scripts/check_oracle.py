"""Driver-style correctness check: run every queries() entry on Spark and
its oracle_sql() in DuckDB at the given SF, compare row count, column set,
and order-insensitive values. Reports exact float mismatches (the driver
hashes values, so we aim for bit-equality, not allclose).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from htrc_feature_reader_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        return [f"rowcount spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        # The driver's value hash is dtype-sensitive: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT window sums surfacing as
        # float) hash-mismatches even when values are equal. Flag it here.
        s_int = np.issubdtype(sv.dtype, np.integer)
        o_int = np.issubdtype(ov.dtype, np.integer)
        s_flt = np.issubdtype(sv.dtype, np.floating)
        o_flt = np.issubdtype(ov.dtype, np.floating)
        if (s_int and o_flt) or (s_flt and o_int):
            problems.append(
                f"col {c}: dtype drift spark={sv.dtype} oracle={ov.dtype} "
                "(driver hash is dtype-sensitive; CAST the oracle side)"
            )
            continue
        # int WIDTH drift (int32 vs int64) is just as hash-hostile: Spark
        # bit_count/length/row_number return int32, DuckDB counts BIGINT
        if s_int and o_int and sv.dtype != ov.dtype:
            problems.append(
                f"col {c}: int width drift spark={sv.dtype} oracle={ov.dtype} "
                "(cast the Spark side to long)"
            )
            continue
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype(float); ov = ov.astype(float)
            both_nan = np.isnan(sv) & np.isnan(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                diffs = np.abs(sv[~eq] - ov[~eq])
                problems.append(
                    f"col {c}: {(~eq).sum()} float mismatches, max abs diff {np.nanmax(diffs):.3e}"
                )
        else:
            eq = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
            if not np.asarray(eq).all():
                bad = int((~np.asarray(eq)).sum())
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(f"col {c}: {bad} mismatches, first: spark={sv[i]!r} oracle={ov[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
