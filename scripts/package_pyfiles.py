"""Package light_curve_spark for `spark-submit --py-files` (north_rule:
"packaged for spark-submit --py-files on a multi-executor cluster").

    python scripts/package_pyfiles.py  ->  dist/light_curve_spark.zip

Usage on a cluster:
    spark-submit --py-files dist/light_curve_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "light_curve_spark.zip")
    pkg = os.path.join(REPO, "light_curve_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
