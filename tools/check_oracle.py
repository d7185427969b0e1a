#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

For every query in __spark_entry__.queries(): run it on Spark at the given
SF, run the matching oracle_sql() on DuckDB over the same parquet tables, and
compare row count, sorted column names, and an order-insensitive value frame
(rows sorted by every column, exact equality; floats reported with max-abs
diff when they differ).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd


# Rows-only queries whose EMPTY result at a given SF is known-correct
# (round-7 verdict finding 3: silent zero-rows is a breakage window, so
# an unexpected empty result now FAILS the preflight instead of warning).
# communities@sf0.001: the >=2-shared-affinity graph is empty at that
# scale — pinned non-empty at sf0.01 by tests/test_suite_nonempty.py.
EXPECTED_EMPTY = {("0.001", "communities")}


def _sf_token(sf_dir: str) -> str:
    import os

    return os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _freeze(v):
    """Deep-convert nested values to hashable, orderable tuples: numpy
    arrays / lists → tuples, structs (rendered as dicts by Arrow toPandas)
    → (key, value) tuples — so sort_values/factorize work on
    array<struct<...>> columns."""
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, dict):
        return tuple((k, _freeze(x)) for k, x in v.items())
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            df[c] = col.map(
                lambda v: _freeze(v)
                if hasattr(v, "tolist") or isinstance(v, (dict, list, tuple))
                else v
            )
        elif pd.api.types.is_bool_dtype(col):
            df[c] = col.astype("boolean")
        elif pd.api.types.is_integer_dtype(col):
            df[c] = col.astype("Int64")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(oc):
            # Bit-exact: the driver hashes rendered values, so -0.0 vs 0.0
            # (same float, different bits) is a real failure there. Compare
            # the raw IEEE-754 bit patterns, treating NaN==NaN as equal.
            sa = sc.to_numpy(dtype="float64", na_value=float("nan"))
            oa = oc.to_numpy(dtype="float64", na_value=float("nan"))
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = pd.Series((sa.view(np.int64) == oa.view(np.int64)) | both_nan)
            if not eq.all():
                diff = np.nanmax(np.abs(sa - oa)[~eq.to_numpy()])
                idx = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} bit-exact mismatches, max abs diff {diff}, "
                    f"e.g. row {idx}: {sa[idx]!r} vs {oa[idx]!r}"
                )
        else:
            sc2 = sc.astype(str)
            oc2 = oc.astype(str)
            eq = (sc2 == oc2) | (sc.isna() & oc.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c} ({sc.dtype} vs {oc.dtype}): {int((~eq).sum())} mismatches, "
                    f"e.g. row {idx}: {sc.iloc[idx]!r} vs {oc.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from realtime_fraud_detection_spark.session import get_spark

    spark = get_spark("check-oracle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # the driver hash-checks only the FIRST 50 queries() entries — an
    # oracled query past #50 (or a rows-only one inside the window) is a
    # silently weakened gate, so the preflight fails loudly on it
    names = list(qs)
    window, tail = names[:50], names[50:]
    misplaced = [n for n in window if n not in oracles] + [
        n for n in tail if n in oracles
    ]
    if misplaced:
        print(f"FAIL  window invariant: misplaced queries {misplaced}")
        return 1
    failed = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            elapsed = f"[{time.time()-t0:.1f}s]"
            if len(sdf) == 0 and (_sf_token(sf_dir), name) in EXPECTED_EMPTY:
                print(f"OK?   {name}: no oracle (rows-only), rows=0 "
                      f"(expected-empty at this SF, pinned) {elapsed}")
            elif len(sdf) == 0:
                print(f"FAIL  {name}: rows-only query returned ZERO rows "
                      f"(not in EXPECTED_EMPTY) {elapsed}")
                failed.append(name)
            else:
                print(f"OK?   {name}: no oracle (rows-only), rows={len(sdf)} {elapsed}")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            print(f"OK    {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")

    print(f"\n{checked - len(failed)}/{checked} passed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
