"""Build the --py-files artifact for cluster submission.

The engine is pure Python (no custom JVM jars, no native deps beyond the
cluster-standard numpy/pandas/pyarrow), so deployment is exactly one zip:

    python tools/package.py                # writes dist/spark_shp.zip
    spark-submit --py-files dist/spark_shp.zip \
        --conf spark.driver.extraJavaOptions=-XX:-DontCompileHugeMethods \
        --conf spark.executor.extraJavaOptions=-XX:-DontCompileHugeMethods \
        your_job.py

(The two extraJavaOptions mirror spark_shp.session.get_spark — see
BENCH/BASELINE.md finding #2; get_spark sets them automatically when the
session is built by the engine itself.)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "spark_shp.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "spark_shp")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
