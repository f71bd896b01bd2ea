"""Table access: testdata parquet loaders and the snapshot-capable
storage layer.

Production target is Iceberg (``spark.read.format("iceberg")`` /
``df.writeTo(...).append()`` with ``VERSION AS OF`` for resume —
SURVEY.md §2.2). The sandbox has no Iceberg runtime jar, so the layer is
an interface with two implementations resolved at session build:

- :class:`IcebergStorage` — used when the Iceberg Spark extension classes
  load; snapshot ids are Iceberg snapshot ids. A REAL end-to-end test
  (append -> VERSION AS OF -> resume, tests/test_iceberg_real.py) runs
  whenever ``SPARK_GRAFT_ICEBERG_JAR`` points at a runtime jar; this
  offline container has none, so it auto-skips and the mocked contract
  test plus the parquet twin carry coverage here.
- :class:`ParquetSnapshotStorage` — parquet directories plus a JSON
  manifest (``_snapshots.json``) recording one immutable directory per
  snapshot; gives the same append/read-version/resume contract so pytest
  never needs the jar (SURVEY.md §7 phase 6).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One testdata table (TESTDATA.md). Plain parquet scan — Catalyst
    handles pushdown/pruning from here."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe only
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _fix_empty_partitioned_snapshot(
    df: DataFrame, out: str, partition_by: list[str] | None
) -> None:
    """An EMPTY hive-partitioned write emits only ``_SUCCESS`` — no
    parquet file, no schema — so any later read of a manifest that
    includes that snapshot raises UNABLE_TO_INFER_SCHEMA and the table
    is permanently unreadable (round-6 ADVICE highs: an all-tombstoned
    incremental batch, or a compaction that erases every row). Detect
    the poison AFTER the write (zero extra Spark jobs on the non-empty
    path) and rewrite the snapshot NON-partitioned: the empty parquet
    file then carries the full schema with the partition columns as
    regular (all-null-capable, zero-row) columns, which unionByName
    merges cleanly with hive-partitioned sibling snapshots."""
    if not partition_by:
        return
    try:
        entries = os.listdir(out)
    except OSError:
        return
    # data present iff the write produced hive partition dirs (col=value
    # — note the engine's partition columns start with '_', e.g. _pb=3,
    # so "starts with underscore" does NOT mean metadata) or part files
    if any(
        ("=" in e) or e.endswith(".parquet")
        for e in entries
        if not e.startswith(".")
    ):
        return
    import shutil

    shutil.rmtree(out)
    df.write.mode("error").parquet(out)


class ParquetSnapshotStorage:
    """Append-only snapshot storage over plain parquet.

    Layout: ``<root>/<table>/snap-<id>/part-*.parquet`` plus
    ``<root>/<table>/_snapshots.json`` listing snapshot ids in commit
    order. Reading a table unions all snapshot dirs up to the pinned id —
    the same semantics as Iceberg time travel, minus file-level deletes
    (the engine only appends).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_snapshots.json")

    def snapshots(self, table: str) -> list[dict]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def exists(self, table: str) -> bool:
        """True once the table has at least one committed snapshot."""
        return bool(self.snapshots(table))

    def current_snapshot(self, table: str) -> str | None:
        snaps = self.snapshots(table)
        return snaps[-1]["id"] if snaps else None

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> str:
        """Append df as a new snapshot; returns the snapshot id.

        ``partition_by`` mirrors Iceberg partition specs (SURVEY.md §4.3:
        rollup tables by (tier, source), chunk table by source) so reads
        get partition pruning and writes need no extra shuffle.

        ``cluster_by`` adds the second skipping axis WITHIN partitions
        (round 5): one range shuffle on (partition cols + cluster cols)
        plus a within-task sort, so each partition directory's files
        carry near-disjoint footer min/max ranges over the cluster
        columns — a reader filtering on them prunes row groups the
        partition filter alone cannot (same discipline as
        :func:`light_curve_spark.sources.layout.write_clustered`; feeds
        an Iceberg sort-order spec verbatim on a real warehouse).

        ``meta`` (round 6) attaches small JSON-able key/values to the
        snapshot manifest entry — the Iceberg snapshot-summary analogue.
        The incremental operators stamp each append with its content
        batch id (and the index hash-family config), so idempotency /
        era probes become an O(#snapshots) manifest read instead of a
        full-index Spark scan per delivery (round-5 ADVICE: the probe
        jobs grew with index size on every arriving batch)."""
        snap_id = uuid.uuid4().hex[:16]
        out = os.path.join(self.root, table, f"snap-{snap_id}")
        if cluster_by:
            keys = [*(partition_by or []), *cluster_by]
            df = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
        writer = df.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        _fix_empty_partitioned_snapshot(df, out, partition_by)
        snaps = self.snapshots(table)
        entry = {"id": snap_id, "committed_at": time.time(), "path": out}
        if meta:
            entry["meta"] = meta
        snaps.append(entry)
        self._commit_manifest(table, snaps, snap_id)
        return snap_id

    def _commit_manifest(self, table: str, snaps: list[dict], snap_id: str) -> None:
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        # the manifest rewrite IS the commit point: write-temp + atomic
        # rename so a crash mid-commit leaves either the old manifest
        # (snapshot dir orphaned and invisible) or the new one — never a
        # truncated file
        manifest = self._manifest_path(table)
        tmp = f"{manifest}.tmp-{snap_id}"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, manifest)

    def snapshot_metas(self, table: str) -> list[dict] | None:
        """The per-snapshot ``meta`` dicts in commit order, or ``None``
        if ANY committed snapshot lacks one (legacy table — callers fall
        back to scanning the data). All-or-nothing on purpose: a partial
        meta list would let an idempotency probe miss a legacy batch and
        double-fold it."""
        snaps = self.snapshots(table)
        metas = [s.get("meta") for s in snaps]
        if any(m is None for m in metas):
            return None
        return metas

    def replace(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> str:
        """Rewrite the table as ONE snapshot holding ``df`` — the
        compaction commit (Iceberg ``rewrite_data_files`` analogue).
        The new snapshot is written first, then the manifest atomically
        becomes ``[new]``; superseded snapshot dirs are deleted after the
        commit (best-effort — a crash mid-delete orphans directories the
        manifest no longer references, never corrupts the table). Prior
        snapshot ids stop being readable, exactly like an expired
        Iceberg snapshot after ``expire_snapshots``; callers that need
        the folded history (e.g. the batch ids every compacted delivery
        carried) pass it forward in ``meta``."""
        snap_id = uuid.uuid4().hex[:16]
        out = os.path.join(self.root, table, f"snap-{snap_id}")
        if cluster_by:
            keys = [*(partition_by or []), *cluster_by]
            df = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
        writer = df.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        _fix_empty_partitioned_snapshot(df, out, partition_by)
        old = self.snapshots(table)
        entry = {"id": snap_id, "committed_at": time.time(), "path": out}
        if meta:
            entry["meta"] = meta
        self._commit_manifest(table, [entry], snap_id)
        import shutil

        for s in old:
            try:
                shutil.rmtree(s["path"])
            except OSError:
                pass  # orphaned dir, invisible to readers
        return snap_id

    def read(self, table: str, as_of: str | None = None) -> DataFrame:
        """Read the table, optionally pinned at a snapshot id
        (``VERSION AS OF`` equivalent)."""
        snaps = self.snapshots(table)
        if as_of is not None:
            upto = [s for i, s in enumerate(snaps) if i <= _index_of(snaps, as_of)]
        else:
            upto = snaps
        if not upto:
            raise ValueError(f"table {table} has no snapshots")
        # one read per snapshot root: each root may carry hive-style
        # partition dirs (tier=X/source=Y), and Spark's partition
        # discovery rejects multiple such roots in a single read
        dfs = [self.spark.read.parquet(s["path"]) for s in upto]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    def read_snapshot(self, table: str, snap_id: str | None = None) -> DataFrame:
        """Read EXACTLY one snapshot (default: latest) — for tables with
        replace-on-write semantics (e.g. the continuous rollup, where
        each snapshot holds the full merged state)."""
        snaps = self.snapshots(table)
        if not snaps:
            raise ValueError(f"table {table} has no snapshots")
        snap = snaps[-1] if snap_id is None else snaps[_index_of(snaps, snap_id)]
        return self.spark.read.parquet(snap["path"])


def _index_of(snaps: list[dict], snap_id: str) -> int:
    for i, s in enumerate(snaps):
        if s["id"] == snap_id:
            return i
    raise ValueError(f"unknown snapshot {snap_id}")


class IcebergStorage:
    """Iceberg-backed storage (used when the runtime jar is present)."""

    def __init__(self, spark: SparkSession, catalog: str = "spark_catalog"):
        self.spark = spark
        self.catalog = catalog

    def exists(self, table: str) -> bool:
        """Catalog probe — the backend-appropriate existence check
        (``read`` on a missing Iceberg table raises AnalysisException,
        not ValueError, so callers must never probe by catching)."""
        return self.spark.catalog.tableExists(table)

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> str:
        # Iceberg partitioning lives in the table spec (PARTITIONED BY at
        # CREATE TABLE) and clustering in its sort-order spec; the
        # arguments are accepted for interface parity, and cluster_by is
        # honored by pre-sorting the write (same file-level effect).
        # ``meta`` maps onto Iceberg snapshot-summary properties
        # (write option ``snapshot-property.<key>``) — the public API for
        # stamping a commit, readable back from ``{table}.snapshots``.
        if cluster_by:
            keys = [*(partition_by or []), *cluster_by]
            df = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
        # First write auto-creates the table (writeTo().append() fails on
        # an uncreated table) — same append-from-nothing contract as the
        # parquet twin.
        writer = df.writeTo(table)
        for k, v in (meta or {}).items():
            writer = writer.option(f"snapshot-property.{k}", json.dumps(v))
        if not self.exists(table):
            writer.create()
        else:
            writer.append()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).head()
        return str(row[0])

    def snapshot_metas(self, table: str) -> list[dict] | None:
        """Snapshot metas from the Iceberg snapshot summaries (keys this
        layer wrote as ``snapshot-property.*``); ``None`` when any
        snapshot carries no such keys (written outside this layer)."""
        rows = self.spark.sql(
            f"SELECT summary FROM {table}.snapshots ORDER BY committed_at"
        ).collect()
        metas: list[dict] = []
        ours = None
        for r in rows:
            summary = dict(r[0] or {})
            m = {}
            for k, v in summary.items():
                try:
                    m[k] = json.loads(v)
                except (TypeError, ValueError):
                    m[k] = v
            # Iceberg injects operational keys (added-files etc.) into
            # every summary; a snapshot is "ours" iff it carries the
            # batch stamp this layer writes
            ours = m if ("batch_id" in m or "batch_ids" in m or "eval_id" in m) else None
            if ours is None:
                return None
            metas.append(ours)
        return metas

    def replace(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        cluster_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> str:
        """Compaction commit: the table becomes exactly ``df`` in one
        atomic Iceberg replace."""
        if cluster_by:
            keys = [*(partition_by or []), *cluster_by]
            df = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
        writer = df.writeTo(table)
        for k, v in (meta or {}).items():
            writer = writer.option(f"snapshot-property.{k}", json.dumps(v))
        writer.createOrReplace()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).head()
        return str(row[0])

    def current_snapshot(self, table: str) -> str | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(rows[0][0]) if rows else None

    def read(self, table: str, as_of: str | None = None) -> DataFrame:
        if as_of is None:
            return self.spark.read.format("iceberg").load(table)
        return self.spark.read.format("iceberg").option("snapshot-id", as_of).load(table)


def get_storage(spark: SparkSession, root: str):
    """Resolve the storage backend for this session (Iceberg if loadable,
    else parquet+manifest)."""
    if iceberg_available(spark):
        return IcebergStorage(spark)
    return ParquetSnapshotStorage(spark, root)
