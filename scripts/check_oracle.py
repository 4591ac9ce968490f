"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() through DuckDB at
the given sf_dir, then compare row-count, column names, and values
(columns sorted by name, rows sorted, exact equality — same strictness
as a value hash).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if len(a) != len(b):
        problems.append(f"rowcount {len(a)} vs {len(b)}")
    if list(a.columns) != list(b.columns):
        problems.append(f"cols {list(a.columns)} vs {list(b.columns)}")
        return problems
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                b[c].dtype, np.floating
            ):
                ok = np.allclose(
                    av.astype(float), bv.astype(float),
                    rtol=0, atol=0, equal_nan=True,
                )
                if not ok:
                    exact = (av == bv) | (pd.isna(av) & pd.isna(bv))
                    bad = np.where(~exact)[0][:3]
                    problems.append(
                        f"col {c} value diff at rows {bad.tolist()}: "
                        f"{[(av[i], bv[i]) for i in bad]}"
                    )
            else:
                eq = pd.Series(av) .eq(pd.Series(bv)) | (
                    pd.Series(av).isna() & pd.Series(bv).isna()
                )
                if not eq.all():
                    bad = np.where(~eq.values)[0][:3]
                    problems.append(
                        f"col {c} ({a[c].dtype}/{b[c].dtype}) diff at rows "
                        f"{bad.tolist()}: {[(av[i], bv[i]) for i in bad]}"
                    )
            if str(a[c].dtype) != str(b[c].dtype):
                problems.append(f"col {c} dtype {a[c].dtype} vs {b[c].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from locustdb_spark import get_spark

    spark = get_spark(app_name="check-oracle")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        spark_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows, "
                  f"{spark_s:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {spark_s:.1f}s spark)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
