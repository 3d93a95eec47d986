"""Local emulation of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB, compare
row count, column names, and (column-name-sorted, row-sorted) values."""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from binlog_avro_comparator_spark.session import get_spark
from __spark_entry__ import queries, oracle_sql

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


import numpy as np
from decimal import Decimal


def norm_cell(v):
    # Type-TAGGED so an int64 never compares equal to a float64 with the
    # same value (the driver's hash distinguishes 1 from 1.0 -- round-1's
    # two hash-fails were exactly this, hidden by a laxer normalizer).
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "B:" + str(bool(v))
    if isinstance(v, (int, np.integer)):
        return "I:" + str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return "F:" + repr(f)
    if isinstance(v, Decimal):
        return "D:" + str(v)
    return "S:" + str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    spark = get_spark("check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({t1-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            ok = False
        elif len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            ok = False
        else:
            cs, cd = canon(sdf), canon(ddf)
            if cs != cd:
                ndiff = sum(1 for a, b in zip(cs, cd) if a != b)
                print(f"FAIL {name}: {ndiff}/{len(cs)} rows differ")
                for a, b in zip(cs, cd):
                    if a != b:
                        print(f"  spark: {a}\n  duck:  {b}")
                        break
                ok = False
        if ok:
            print(f"OK   {name}: {len(sdf)} rows ({t1-t0:.1f}s spark)")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
