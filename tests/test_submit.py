"""spark-submit --py-files packaging (north_rule): the dist zip alone —
no repo on sys.path — must provide the package to a cluster-shaped job."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
from pyspark.sql import SparkSession, functions as F
from light_curve_spark.sources.synthetic import synthetic_sequences
from light_curve_spark.operators.rollup import rollup_tiers_arrays
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
seq = synthetic_sequences(spark, 100, seed=42)
print("SUBMIT_RESULT rolled=%d" % rollup_tiers_arrays(seq).count())
spark.stop()
"""


def test_spark_submit_pyfiles(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert "SUBMIT_RESULT rolled=" in out.stdout, out.stderr[-2000:]
    rolled = int(out.stdout.split("SUBMIT_RESULT rolled=")[1].split()[0])
    assert rolled > 0
