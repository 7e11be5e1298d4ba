"""Local stand-in for the driver's correctness gate: run every REGISTRY
query on Spark and its oracle on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (columns sorted by name,
rows sorted, values stringified).

Round-2 hardening: the driver's canonicalizer is DTYPE-sensitive (it
hashes pandas frames), so equal values in different physical types
(DuckDB HUGEINT/DECIMAL vs Spark BIGINT) hash-mismatch even though the
stringified compare here passes. This gate therefore ALSO fails on:

- list-valued cells on either side (pandas sort_values cannot sort
  them — the round-1 q24 driver error);
- object-dtype columns holding raw ints/Decimals (the HUGEINT/DECIMAL
  signature of an un-normalized aggregate);
- integer-kind vs float/object-kind dtype disagreements between the two
  sides on null-free columns.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def _kind(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    return "object"


def dtype_problems(name: str, spdf: pd.DataFrame, dpdf: pd.DataFrame) -> list[str]:
    """Driver-canonicalizer hazards that the stringified compare hides."""
    probs: list[str] = []
    for side, pdf in (("spark", spdf), ("duck", dpdf)):
        for c in pdf.columns:
            nonnull = pdf[c].dropna()
            if nonnull.empty:
                continue
            v = nonnull.iloc[0]
            if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
                probs.append(f"{side}.{c}: list-valued cells (unsortable in pandas)")
            elif pdf[c].dtype.kind == "O" and isinstance(v, decimal.Decimal):
                probs.append(f"{side}.{c}: raw Decimal cells (normalize to BIGINT/double)")
            elif pdf[c].dtype.kind == "O" and isinstance(v, int) and not isinstance(v, bool):
                probs.append(f"{side}.{c}: object-int cells (HUGEINT? cast to BIGINT)")
    sp = {c: spdf[c] for c in spdf.columns}
    du = {c: dpdf[c] for c in dpdf.columns}
    for c in set(sp) & set(du):
        if sp[c].isna().any() or du[c].isna().any():
            continue  # nulls legitimately float-ify int columns
        ks, kd = _kind(sp[c].dtype), _kind(du[c].dtype)
        if ks != kd:
            probs.append(f"{c}: dtype kind spark={ks} vs duck={kd}")
    return probs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from radiant_portal_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dpdf = rel.df()
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sn = norm_rows(scols, srows)
        dc, dn = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
            n_fail += 1
            continue
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in diffs:
                print(f"  spark: {a}\n  duck : {b}")
            n_fail += 1
            continue
        probs = dtype_problems(name, spdf, dpdf)
        if probs:
            print(f"FAIL {name}: dtype hazards (driver hash would diverge):")
            for p in probs:
                print(f"  {p}")
            n_fail += 1
            continue
        print(f"PASS {name}: rows={len(sn)}")
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
