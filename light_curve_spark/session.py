"""SparkSession construction with the engine's scale configs.

Defaults encode the north_rule's execution posture (BASELINE.json):
AQE on (runtime re-plan + skew-join splitting for the rollup groupBys),
Arrow on (every kernel crosses JVM<->Python as columnar batches, never
rows), bounded Arrow batch size (a grouped-map UDF materializes one group
per batch — cap it so long-tail n_tok outliers can't blow executor
memory, SURVEY.md §4.3).

On a real cluster the same builder is used by spark-submit --py-files;
``master`` is left unset there so the cluster manager decides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
DEFAULT_MAX_ARROW_BATCH = 10_000


def build_session(
    app_name: str = "light-curve-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a session with engine defaults.

    ``master=None`` resolves to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox
    (driver contract) and to the cluster manager's choice under
    spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # local mode runs driver + all executor threads in ONE JVM whose
        # default heap is 1g — enough for unit tests, an OOM at bench
        # scale (found at 500k sequences / 150M tokens). Sized via env so
        # CI containers can lower it; ignored under spark-submit where
        # the cluster manager owns executor sizing.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        # AQE: runtime coalescing + skew splitting for rollup shuffles.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for every pandas UDF / applyInPandas crossing.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(DEFAULT_MAX_ARROW_BATCH),
        # deterministic timestamps in goldens
        "spark.sql.session.timeZone": "UTC",
        # iterative operators (star CC) delete superseded round
        # checkpoints explicitly; this catches the FINAL checkpoint of
        # each call once its DataFrame is GC'd, so long-running apps
        # don't accumulate one dir per dedup_clusters() invocation
        "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
        # parquet scans: allow filter pushdown + vectorized reader (defaults,
        # pinned explicitly because goldens depend on pruned scans)
        "spark.sql.parquet.filterPushdown": "true",
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
