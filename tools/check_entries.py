"""Local mimic of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_entries.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from fornax_spark.session import get_spark  # noqa: E402
from fornax_spark.sources import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("check-entries", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    import time

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:300]}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append((name, f"cols {sc} != {dc}"))
            print(f"FAIL  {name}: cols {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append((name, f"rowcount {len(sr)} != {len(dr)}"))
            print(f"FAIL  {name}: rows {len(sr)} vs {len(dr)}")
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ, e.g. {diff}")
        else:
            print(f"OK    {name}: {len(sr)} rows  [{time.time()-t0:.1f}s]", flush=True)
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
