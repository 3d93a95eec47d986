"""Dump .explain('formatted') for named queries to plans/r12/<name>_<suffix>.txt.
Usage: PYTHONPATH=<tree> python dump_plans.py <outdir> <suffix> name1,name2,...
The judge checks plan claims against these files."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.environ.get("PLAN_TREE", "/root/repo"))

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
