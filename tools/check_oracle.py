"""Local replica of the driver's correctness gate.

Runs every declared query on Spark and (when an oracle exists) the matching
SQL on DuckDB over the same parquet, then compares row count, column names,
and an order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from glue_etl_nyc_yellow_taxi_analysis_spark.queries import ORACLE, QUERIES, TABLES_SQL_NAMES
from glue_etl_nyc_yellow_taxi_analysis_spark.session import get_spark


def norm_cell(v):
    import datetime as dt
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6f}" if v == v else "nan"
    if isinstance(v, Decimal):
        return f"{float(v):.6f}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # simulate the external driver: a bare session, none of
        # session.py's tuned config (catches hidden dependencies on it)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES_SQL_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        # Driver-hazard lint: the external driver canonicalizes via pandas
        # (toPandas vs duckdb.df()), where list/map/struct cells are
        # unhashable in sort_values and Decimal-vs-float64 dtypes hash
        # differently even when values agree.  Any oracle-bearing query
        # must emit only scalar, non-decimal output columns.
        if ORACLE.get(name) is not None:
            from pyspark.sql import types as _T

            hazards = [
                f.name
                for f in df.schema.fields
                if isinstance(
                    f.dataType,
                    (_T.DecimalType, _T.ArrayType, _T.MapType, _T.StructType),
                )
            ]
            if hazards:
                print(f"FAIL  {name}: driver-hazard output dtypes on {hazards}")
                failures.append(name)
                continue
        took = time.time() - t0
        sql = ORACLE.get(name)
        if sql is None:
            print(f"rows  {name}: {len(rows)} rows ({took:.1f}s) [rows-only]")
            if len(rows) == 0 and name != "q_join_anti":
                print(f"      WARNING: empty result")
            continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_n = len(rows) == len(o_rows)
        ok_c = sorted(cols) == sorted(o_cols)
        ok_h = value_hash(cols, rows) == value_hash(o_cols, o_rows)
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        print(
            f"{status}  {name}: rows {len(rows)}/{len(o_rows)} cols={ok_c} hash={ok_h}"
            f" ({took:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_c:
                print(f"      spark cols: {sorted(cols)}\n      duck  cols: {sorted(o_cols)}")
            elif ok_n and len(rows) <= 12:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                s_lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
                oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                d_lines = sorted("|".join(norm_cell(r[i]) for i in oo) for r in o_rows)
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"      spark: {a}\n      duck : {b}")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
