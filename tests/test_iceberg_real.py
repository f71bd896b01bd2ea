"""REAL Iceberg end-to-end (jar-gated): snapshot append -> VERSION AS OF
read -> second append -> pinned re-read through IcebergStorage
(sources/catalog.py), against an actual Iceberg hadoop catalog.

This container is offline with no Iceberg runtime jar anywhere on disk
(verified round 3), so the test SKIPS unless ``SPARK_GRAFT_ICEBERG_JAR``
points at an ``iceberg-spark-runtime`` jar — at which point it runs the
genuine article with zero code changes:

    SPARK_GRAFT_ICEBERG_JAR=/path/iceberg-spark-runtime-4.0_2.13-x.y.z.jar \
        python -m pytest tests/test_iceberg_real.py -q

It runs in a SUBPROCESS because the Iceberg catalog/extension classes
must be on the driver classpath at JVM launch — the session-scoped test
fixture's JVM cannot load them retroactively.
"""

import os
import subprocess
import sys

import pytest

JAR = os.environ.get("SPARK_GRAFT_ICEBERG_JAR", "")

_DRIVER = r"""
import sys
from pyspark.sql import SparkSession

jar, warehouse = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("iceberg-e2e")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from light_curve_spark.sources.catalog import IcebergStorage, iceberg_available

assert iceberg_available(spark), "jar supplied but SparkCatalog did not load"
spark.sql(
    "CREATE TABLE local.db.t (doc_id BIGINT, v DOUBLE) USING iceberg"
)
st = IcebergStorage(spark)
s1 = st.append(spark.range(5).selectExpr("id AS doc_id", "id * 1.0 AS v"),
               "local.db.t")
s2 = st.append(spark.range(5, 8).selectExpr("id AS doc_id", "id * 1.0 AS v"),
               "local.db.t")
assert st.current_snapshot("local.db.t") == s2
assert st.read("local.db.t").count() == 8
assert st.read("local.db.t", as_of=s1).count() == 5   # VERSION AS OF
assert st.read("local.db.t", as_of=s2).count() == 8
# resume posture: a re-run that pins the previous snapshot sees the
# pre-append world, exactly like the parquet-manifest twin
ids = sorted(r.doc_id for r in st.read("local.db.t", as_of=s1).collect())
assert ids == [0, 1, 2, 3, 4]
print("ICEBERG_E2E_OK")
"""


@pytest.mark.skipif(
    not (JAR and os.path.exists(JAR)),
    reason="no Iceberg runtime jar on this host (offline container); "
    "set SPARK_GRAFT_ICEBERG_JAR to run the real end-to-end",
)
def test_iceberg_snapshot_append_version_as_of_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, JAR, str(tmp_path / "warehouse")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG_E2E_OK" in proc.stdout
