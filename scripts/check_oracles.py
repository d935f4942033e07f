"""Local replica of the driver's oracle comparison.

Runs each queries() entry on Spark and its oracle_sql() twin on DuckDB
at the given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats normalised).  Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_df(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            continue
        if np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].astype(np.float64).round(6) + 0.0
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def value_hash(pdf: pd.DataFrame) -> str:
    body = pdf.to_csv(index=False, float_format="%.6g").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from xarray_spatial_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # pragma: no cover
            print(f"{name:24s} SPARK ERROR: {e}")
            bad.append(name)
            continue
        if sql is None:
            print(f"{name:24s} rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # pragma: no cover
            print(f"{name:24s} ORACLE ERROR: {e}")
            bad.append(name)
            continue
        s, o = norm_df(sdf), norm_df(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        h = value_hash(s) == value_hash(o) if rows and schema else False
        status = "OK" if (rows and schema and h) else "FAIL"
        print(f"{name:24s} {status} rows={len(s)}/{len(o)} schema={schema} hash={h}")
        if status == "FAIL":
            bad.append(name)
            if rows and schema:
                for c in s.columns:
                    if not s[c].equals(o[c]):
                        diff = (s[c] != o[c])
                        if np.issubdtype(s[c].dtype, np.floating):
                            diff = ~np.isclose(
                                s[c].fillna(1e300), o[c].fillna(1e300), atol=1e-9
                            )
                        n = int(np.sum(diff))
                        print(f"    col {c}: {n} differing cells; "
                              f"spark={s[c][diff].head(3).tolist()} "
                              f"oracle={o[c][diff].head(3).tolist()}")
    print("BAD:", bad if bad else "none")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
