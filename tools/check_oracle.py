"""Local replica of the build driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.dropna().iloc[0] if col.dropna().size else None, (list, tuple)
        ):
            df[c] = col.map(lambda v: tuple(v) if v is not None else None)
    try:
        return df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        return df.sort_values(
            by=list(df.columns), key=lambda s: s.map(repr), ignore_index=True
        )


def value_hash(df: pd.DataFrame) -> str:
    df = _normalize(df)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from website_indexer_spark.sources.tables import build_spark

    spark = build_spark(app_name="oracle-check", master="local[8]",
                        shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"okNR {name}: rows={len(sdf)} (rows-only, no oracle) "
                  f"[{spark_s:.1f}s]")
            if len(sdf) == 0:
                print(f"     note: {name} returned 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
                merged = _normalize(sdf).compare(_normalize(odf)) if len(
                    sdf
                ) == len(odf) else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: rows={len(sdf)} hash match [{spark_s:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
