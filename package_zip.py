"""Build the spark-submit deployment artifact: a --py-files zip of the
pure-Python package (no build toolchain needed -- the canonical way to
ship Python code to Spark executors).

    python package_zip.py [out.zip]     # default dist/bac_spark.zip

then on a cluster:

    spark-submit --py-files dist/bac_spark.zip your_driver.py
    # or the built-in CDC diff driver:
    spark-submit --py-files dist/bac_spark.zip \
        -m binlog_avro_comparator_spark --binlog-text DIR --avro-jsonl FILE

`pyproject.toml` additionally makes the repo pip-installable
(`pip install .`) for image-based deployments where executors share a
site-packages; the zip path needs nothing but this script.
"""

from __future__ import annotations

import os
import sys
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))


def build(out: str) -> int:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(HERE, "binlog_avro_comparator_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, HERE))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "dist", "bac_spark.zip")
    n = build(out)
    print(f"{out}: {n} modules")
