"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive values (exact string equality after canonical
formatting). Exit non-zero on any mismatch.

Usage: python3 tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(round(float(v), 9))
    except ImportError:
        pass
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tackle4losscontentextraction_spark.session import get_spark

    spark = get_spark(app_name="parity", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            continue
        if name not in osql:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            rel = con.sql(osql[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            print(f"[FAIL] {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"[FAIL] {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        else:
            ms = rows_to_multiset(s_rows, s_cols)
            md = rows_to_multiset(d_rows, d_cols)
            if ms != md:
                ok = False
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                print(f"[FAIL] {name}: value mismatch; first diffs:")
                for a, b in diff:
                    print(f"    spark : {a}")
                    print(f"    duckdb: {b}")
        if ok:
            print(f"[ok] {name}: {len(s_rows)} rows")
        else:
            failures.append((name, "mismatch"))

    spark.stop()
    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
