"""Snapshot-isolated (Iceberg-style) table on a plain parquet lake.

``merge_upsert_partitioned`` (sources/partitioned.py) rewrites partitions in
place — correct, but destructive: a reader concurrent with a rewrite can see
a half-replaced partition, and yesterday's table is gone. This module adds
the metadata layer that fixes both, the way Iceberg/Delta do, with nothing
but parquet files and tiny JSON manifests:

- data files are **append-only** under ``{path}/data/`` (hive-partitioned);
  a writer never deletes or rewrites a committed file;
- each commit writes manifest ``{path}/_snapshots/v{N:08d}.json`` listing
  exactly the files that make up that version (grouped by partition).
  Readers resolve a manifest first, then read only its files — so every
  version stays readable (time travel) and an in-flight writer is invisible
  until its manifest lands (snapshot isolation). A crash before the manifest
  write leaves only orphan data files, which ``vacuum_snapshots`` removes;
- MERGE = read the live snapshot, resolve latest-wins per key, append the
  resolved touched partitions as NEW files, and publish a manifest that maps
  touched partitions to the new files while untouched partitions keep their
  old entries. No partition directory is ever deleted: a partition emptied by
  key migration simply has no files in the new manifest.

Single-writer assumption: commits are serialized by the caller (a real
multi-writer deployment would swap the manifest publish for an atomic
compare-and-rename, which is exactly Iceberg's commit protocol). All IO goes
through the Hadoop FileSystem API, so the layout works on any Spark-supported
storage, not just the local FS.

At 100 TB the manifest is the scan planner's friend: ``read_snapshot`` hands
Spark the precise file list, so partition pruning happens at manifest time —
zero listing calls against the (potentially huge) data directory.
"""

from __future__ import annotations

import json
import time
import urllib.parse
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_snapshots"
_DATA_DIR = "data"


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def _list_data_files(spark: SparkSession, path: str) -> set[str]:
    """Recursive listing of ``{path}/data`` as relative paths ('' if absent)."""
    data_dir = f"{path}/{_DATA_DIR}"
    fs = _fs(spark, data_dir)
    dp = _jpath(spark, data_dir)
    if not fs.exists(dp):
        return set()
    prefix = str(fs.makeQualified(dp).toString()) + "/"
    out: set[str] = set()
    it = fs.listFiles(dp, True)
    while it.hasNext():
        f = it.next()
        name = str(f.getPath().toString())
        if name.startswith(prefix):
            rel = name[len(prefix):]
            base = rel.rsplit("/", 1)[-1]
            if not base.startswith(("_", ".")):  # skip _SUCCESS / hidden
                out.add(rel)
    return out


def _read_json(spark: SparkSession, path: str) -> dict[str, Any]:
    fs = _fs(spark, path)
    stream = fs.open(_jpath(spark, path))
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()


class SnapshotConflictError(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency): re-resolve the latest manifest and retry the commit."""


def _write_json(
    spark: SparkSession,
    path: str,
    payload: dict[str, Any],
    if_absent: bool = False,
) -> None:
    fs = _fs(spark, path)
    tmp = _jpath(spark, path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(payload, sort_keys=True).encode("utf-8"))
    finally:
        out.close()
    if if_absent:
        # Manifest publish must be atomic-if-absent: rename onto an existing
        # target returns False (HDFS/local semantics) instead of clobbering,
        # which is exactly the losing writer's signal. Without this, two
        # writers resolving the same parent would both "commit" vN+1 and the
        # first one's files would be silently orphaned — a lost update.
        if fs.exists(_jpath(spark, path)) or not fs.rename(tmp, _jpath(spark, path)):
            fs.delete(tmp, False)
            raise SnapshotConflictError(
                f"concurrent commit detected: {path} already exists"
            )
        return
    fs.delete(_jpath(spark, path), False)
    fs.rename(tmp, _jpath(spark, path))


def _manifest_path(path: str, version: int) -> str:
    return f"{path}/{_MANIFEST_DIR}/v{version:08d}.json"


def snapshot_history(spark: SparkSession, path: str) -> list[dict[str, Any]]:
    """All retained manifests, oldest first."""
    mdir = f"{path}/{_MANIFEST_DIR}"
    fs = _fs(spark, mdir)
    dp = _jpath(spark, mdir)
    if not fs.exists(dp):
        return []
    versions = []
    for st in fs.listStatus(dp):
        name = str(st.getPath().getName())
        if name.startswith("v") and name.endswith(".json"):
            versions.append(int(name[1:-5]))
    return [_read_json(spark, _manifest_path(path, v)) for v in sorted(versions)]


def _resolve_manifest(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of: float | None = None,
) -> dict[str, Any]:
    hist = snapshot_history(spark, path)
    if not hist:
        raise FileNotFoundError(f"no snapshots at {path}")
    if version is not None:
        for m in hist:
            if m["version"] == version:
                return m
        raise FileNotFoundError(
            f"snapshot v{version} not found at {path} "
            f"(retained: {[m['version'] for m in hist]} — vacuumed?)"
        )
    if as_of is not None:
        live = [m for m in hist if m["committed_at"] <= as_of]
        if not live:
            raise FileNotFoundError(f"no snapshot at or before {as_of} at {path}")
        return live[-1]
    return hist[-1]


def _commit(
    spark: SparkSession,
    path: str,
    files: dict[str, list[str]],
    operation: str,
    schema_json: str,
    parent: int | None,
    txn: dict[str, Any] | None = None,
    stats: dict[str, Any] | None = None,
    blooms: dict[str, Any] | None = None,
) -> int:
    version = (parent or 0) + 1
    payload: dict[str, Any] = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "committed_at": time.time(),
        "schema": schema_json,
        "files": {k: sorted(v) for k, v in files.items() if v},
    }
    if txn:
        payload["txn"] = txn
    if stats:
        payload["stats"] = stats
    if blooms:
        payload["blooms"] = blooms
    _write_json(spark, _manifest_path(path, version), payload, if_absent=True)
    return version


def _append_data(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str
) -> dict[str, list[str]]:
    """Append ``df`` as new files; return {partition_dir: [new relpaths]}."""
    before = _list_data_files(spark, path)
    df.write.mode("append").partitionBy(partition_col).parquet(f"{path}/{_DATA_DIR}")
    new = _list_data_files(spark, path) - before
    grouped: dict[str, list[str]] = {}
    for rel in new:
        part = rel.split("/", 1)[0] if "/" in rel else ""
        grouped.setdefault(part, []).append(rel)
    return grouped


def snapshot_overwrite(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str = "metric_date",
    txn: dict[str, Any] | None = None,
) -> int:
    """Publish a full replacement snapshot (previous versions stay readable).

    ``df`` may already carry ``partition_col``; otherwise it is derived as
    ``to_date(ts)`` (the metrics-lake convention of sources/partitioned.py).
    """
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    latest = None
    try:
        latest = _resolve_manifest(spark, path)
    except FileNotFoundError:
        pass
    files = _append_data(spark, df, path, partition_col)
    return _commit(
        spark,
        path,
        files,
        "overwrite",
        df.schema.json(),
        latest["version"] if latest else None,
        txn=txn,
    )


def snapshot_overwrite_clustered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    partition_col: str = "metric_date",
    stats_cols: list[str] | None = None,
    num_files: int | None = None,
) -> int:
    """Full-replacement snapshot whose data files are RANGE-CLUSTERED on
    ``cluster_cols`` — the lake + layout composition (sources/layout.py
    applied inside a manifest commit).

    ``repartitionByRange`` over (partition, cluster keys) gives each output
    file a disjoint key slice; ``sortWithinPartitions`` orders row groups
    inside it. The manifest records per-file min/max of ``stats_cols``
    (default: the cluster columns), so :func:`read_snapshot_pruned` skips
    every file whose zone map misses the predicate — at 100 TB a range query
    on the cluster key reads O(matching files), not O(table), with zero
    directory listing. Previous versions stay readable (time travel);
    re-clustering is just another commit.
    """
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    n = num_files or spark.sparkContext.defaultParallelism
    cols = [F.col(partition_col)] + [F.col(c) for c in cluster_cols]
    clustered = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    try:
        parent = _resolve_manifest(spark, path)["version"]
    except FileNotFoundError:
        parent = None
    files = _append_data(spark, clustered, path, partition_col)
    rels = [rel for group in files.values() for rel in group]
    stats = _footer_stats(
        f"{path}/{_DATA_DIR}", rels, list(stats_cols or cluster_cols)
    )
    return _commit(
        spark,
        path,
        files,
        "overwrite-clustered",
        df.schema.json(),
        parent,
        stats=stats,
    )


def snapshot_append(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str = "metric_date"
) -> int:
    """Append-only ingest commit (no keys, no rewrite): new files simply join
    their partitions' existing entries in the manifest. The natural op for
    immutable fact streams (metrics, events); repeated appends fragment
    partitions, which ``compact_snapshot`` later folds."""
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    new_rels = _append_data(spark, df, path, partition_col)
    # Optimistic-concurrency retry: the data files are already durable and
    # private to this writer (unique part-file names), so losing the
    # manifest race costs one re-resolve + re-commit — never a data
    # rewrite. Appends from concurrent writers are commutative, which is
    # why blind retry is safe here (MERGE/overwrite are coordinated ops
    # and deliberately surface the conflict instead).
    for attempt in range(3):
        try:
            current = _resolve_manifest(spark, path)
            files = {part: list(rels) for part, rels in current["files"].items()}
            parent = current["version"]
        except FileNotFoundError:
            files, parent = {}, None
        for part, rels in new_rels.items():
            files.setdefault(part, []).extend(rels)
        try:
            return _commit(spark, path, files, "append", df.schema.json(), parent)
        except SnapshotConflictError:
            if attempt == 2:
                raise
    raise AssertionError("unreachable")


def last_committed_txn(
    spark: SparkSession, path: str, app_id: str
) -> int:
    """Highest micro-batch id this ``app_id`` has committed (-1 if none) —
    the Delta-style idempotent-writer lookup."""
    latest = -1
    for m in snapshot_history(spark, path):
        txn = m.get("txn")
        if txn and txn.get("app_id") == app_id:
            latest = max(latest, int(txn["batch_id"]))
    return latest


def snapshot_stream_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str = "snapshot-sink",
    partition_col: str = "metric_date",
):
    """Exactly-once streaming ingest into the snapshot lake.

    ``foreachBatch`` gives at-least-once batch delivery: after a crash
    between sink write and checkpoint advance, the SAME (app_id, batch_id)
    is re-delivered. Stamping every commit's manifest with that transaction
    id and skipping batches at or below the last committed one makes the
    append idempotent — the same mechanism as Delta's ``txnAppId`` /
    ``txnVersion`` writer dedup. One manifest read per batch (tiny), one
    append commit per batch; compaction folds the per-batch files later.

    Returns the started StreamingQuery (availableNow-compatible; caller
    awaits/stops).
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id <= last_committed_txn(spark, path, app_id):
            return  # replayed batch: already durable in some manifest
        df = batch_df
        if partition_col not in df.columns:
            df = df.withColumn(partition_col, F.to_date("ts"))
        try:
            current = _resolve_manifest(spark, path)
            files = {p: list(r) for p, r in current["files"].items()}
            parent = current["version"]
        except FileNotFoundError:
            files, parent = {}, None
        for part, rels in _append_data(spark, df, path, partition_col).items():
            files.setdefault(part, []).extend(rels)
        _commit(
            spark,
            path,
            files,
            "stream-append",
            df.schema.json(),
            parent,
            txn={"app_id": app_id, "batch_id": batch_id},
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def snapshot_merge(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    partition_col: str = "metric_date",
) -> int:
    """Latest-wins MERGE as a new snapshot (same semantics as
    ``merge_upsert_partitioned``, including cross-partition key migration —
    the stored row in the old partition is retired because its partition is
    touched and rewritten without it).

    Only the touched partitions are resolved and rewritten; untouched
    partitions are carried into the new manifest by reference — zero IO.
    """
    from pyspark.sql import Window

    updates = updates.withColumn(partition_col, F.to_date("ts"))
    try:
        current_manifest = _resolve_manifest(spark, path)
    except FileNotFoundError:
        files = _append_data(spark, updates, path, partition_col)
        return _commit(spark, path, files, "merge", updates.schema.json(), None)

    existing = read_snapshot(spark, path, version=current_manifest["version"])
    upd_keys = updates.select(*key_cols).distinct()
    upd_parts = updates.select(partition_col).distinct()
    # A manifest partition is rewritten when (a) updates land in it (typed
    # VALUE-level semi-join, so no hand-formatting of partition paths) or
    # (b) it holds a row whose key migrates. Its on-disk directory name is
    # taken from the file-metadata column — Spark escapes special characters
    # in partition paths, so formatting f"{col}={value}" by hand would miss
    # the manifest key and leave stale files referenced (duplicate rows).
    with_dir = existing.withColumn(
        "_pdir", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -2)
    )
    touched_rows = (
        with_dir.join(F.broadcast(upd_parts), [partition_col], "leftsemi")
        .select(partition_col, "_pdir")
        .unionByName(
            with_dir.join(F.broadcast(upd_keys), key_cols, "leftsemi").select(
                partition_col, "_pdir"
            )
        )
        .distinct()
        .collect()
    )
    touched = list({r[0] for r in touched_rows})
    # file_path is a URI — one unquote restores the on-disk manifest key.
    touched_dirs = {urllib.parse.unquote(r[1]) for r in touched_rows}
    current = existing.filter(F.col(partition_col).isin(touched)).withColumn(
        "_is_new", F.lit(0)
    )
    merged = current.unionByName(updates.withColumn("_is_new", F.lit(1)))
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col), F.desc("_is_new"))
    resolved = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_new")
    )
    new_files = _append_data(spark, resolved, path, partition_col)
    files = {
        part: rels
        for part, rels in current_manifest["files"].items()
        if part not in touched_dirs
    }
    files.update(new_files)
    return _commit(
        spark,
        path,
        files,
        "merge",
        resolved.schema.json(),
        current_manifest["version"],
    )


def _read_manifest_files(
    spark: SparkSession, path: str, schema_json: str, rels: list[str]
) -> DataFrame:
    """Read an explicit manifest file subset under the declared schema."""
    data_dir = f"{path}/{_DATA_DIR}"
    schema = StructType.fromJson(json.loads(schema_json))
    if not rels:
        return spark.createDataFrame([], schema)
    # basePath keeps the hive partition column; the explicit file list is the
    # manifest-level pruning — Spark never lists the data directory. The
    # manifest's DECLARED schema governs the read (Iceberg-style schema
    # tracking): files from commits that predate an added column surface it
    # as NULL, and each historical version reads with the schema it was
    # committed under — no mergeSchema footer sweep needed.
    return (
        spark.read.schema(schema)
        .option("basePath", data_dir)
        .parquet(*[f"{data_dir}/{rel}" for rel in rels])
    )


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """The table as of ``version`` / ``as_of`` timestamp (default: latest)."""
    m = _resolve_manifest(spark, path, version=version, as_of=as_of)
    rels = sorted(rel for group in m["files"].values() for rel in group)
    return _read_manifest_files(spark, path, m["schema"], rels)


def rollback_snapshot(spark: SparkSession, path: str, version: int) -> int:
    """Publish a NEW version whose content is snapshot ``version`` (history
    is never rewritten — Iceberg-style rollback-by-commit)."""
    target = _resolve_manifest(spark, path, version=version)
    latest = _resolve_manifest(spark, path)
    return _commit(
        spark,
        path,
        dict(target["files"]),
        f"rollback(v{version})",
        target["schema"],
        latest["version"],
    )


def compact_snapshot(
    spark: SparkSession,
    path: str,
    min_files: int = 2,
    partition_col: str = "metric_date",
) -> int:
    """Rewrite every partition holding >= ``min_files`` fragments into one
    file and publish the result as a new snapshot (content-identical,
    ``operation='compact'``).

    Append-only MERGE commits accumulate small files per touched partition —
    the classic lake small-file problem: at 100 TB a scan pays per-file open
    cost and the manifest grows without bound. Compaction is itself just a
    commit, so readers are never disturbed, old versions stay readable, and
    the superseded fragments are reclaimed by the next ``vacuum_snapshots``.
    Partitions below the threshold are carried over by reference (zero IO).
    ``repartition(n, partition_col)`` routes each partition value to exactly
    one task, so the partitionBy writer emits one file per value; ``n`` only
    caps how many partitions compact concurrently."""
    current = _resolve_manifest(spark, path)
    fragmented = {
        part: rels
        for part, rels in current["files"].items()
        if len(rels) >= min_files
    }
    if not fragmented:
        return current["version"]
    data_dir = f"{path}/{_DATA_DIR}"
    rels = [rel for group in fragmented.values() for rel in group]
    slice_df = spark.read.option("basePath", data_dir).parquet(
        *[f"{data_dir}/{rel}" for rel in rels]
    )
    n_tasks = max(1, min(len(fragmented), spark.sparkContext.defaultParallelism))
    new_files = _append_data(
        spark,
        slice_df.repartition(n_tasks, partition_col),
        path,
        partition_col,
    )
    files = {
        part: rels
        for part, rels in current["files"].items()
        if part not in fragmented
    }
    files.update(new_files)
    return _commit(
        spark, path, files, "compact", current["schema"], current["version"]
    )


def vacuum_snapshots(spark: SparkSession, path: str, keep_last: int = 2) -> int:
    """Drop all but the newest ``keep_last`` manifests and delete data files
    no retained manifest references; returns the number of files deleted.
    Also removes orphans from crashed (never-committed) writes."""
    hist = snapshot_history(spark, path)
    keep, drop = hist[-keep_last:], hist[:-keep_last]
    referenced = {
        rel for m in keep for group in m["files"].values() for rel in group
    }
    fs = _fs(spark, path)
    deleted = 0
    for rel in _list_data_files(spark, path) - referenced:
        fs.delete(_jpath(spark, f"{path}/{_DATA_DIR}/{rel}"), False)
        deleted += 1
    for m in drop:
        fs.delete(_jpath(spark, _manifest_path(path, m["version"])), False)
    return deleted


def refresh_incremental_agg(
    spark: SparkSession,
    lake_path: str,
    state_path: str,
    keys: list[str],
    sums: list[str],
    state_partition_col: str,
) -> dict[str, Any]:
    """Incrementally maintain ``SELECT keys, count(*), sum(sums...)`` over the
    lake at ``lake_path`` — the materialized-view-maintenance move that makes
    a 100 TB nightly rollup cost one DELTA scan instead of one table scan.

    The maintained state (a snapshot table at ``state_path``) stores one row
    per key group: ``n_rows`` plus ``sum_{c}`` for each requested column (the
    caller pre-converts measures to exact integer units, so partial sums are
    associative-exact). Each refresh:

    1. diffs the lake's live manifest file set against the ``absorbed`` list
       recorded in the state's own commit metadata (``txn``) — the same
       manifest-level bookkeeping Iceberg's incremental scan uses;
    2. if files the state already absorbed have DISAPPEARED from the live
       manifest (compaction, rollback, merge rewrites), count/sum deltas are
       no longer derivable — it falls back to one full recompute and
       re-baselines (``mode='full'``);
    3. otherwise it aggregates ONLY the new files (``mode='incremental'``,
       zero work when no new files — ``mode='noop'``) and folds them into the
       state with a union + re-aggregate, which is exact because count/sum
       are mergeable.

    Returns ``{mode, files_read, state_version, source_version}``.
    """
    lake = _resolve_manifest(spark, lake_path)
    live = sorted(rel for group in lake["files"].values() for rel in group)
    prior: dict[str, Any] | None = None
    try:
        prior = _resolve_manifest(spark, state_path)
    except FileNotFoundError:
        pass
    absorbed: list[str] = list((prior or {}).get("txn", {}).get("absorbed", []))

    agg_cols = [F.count(F.lit(1)).cast("long").alias("n_rows")] + [
        F.sum(c).cast("long").alias(f"sum_{c}") for c in sums
    ]
    merge_cols = [F.sum("n_rows").cast("long").alias("n_rows")] + [
        F.sum(f"sum_{c}").cast("long").alias(f"sum_{c}") for c in sums
    ]

    if prior is not None and set(absorbed) - set(live):
        # Absorbed files vanished (compact/rollback/merge): deltas are
        # unrecoverable — re-baseline from the live snapshot.
        full = _read_manifest_files(spark, lake_path, lake["schema"], live)
        state = full.groupBy(*keys).agg(*agg_cols)
        v = snapshot_overwrite(
            spark,
            state,
            state_path,
            state_partition_col,
            txn={"absorbed": live, "source_version": lake["version"]},
        )
        return {
            "mode": "full",
            "files_read": len(live),
            "state_version": v,
            "source_version": lake["version"],
        }

    new = sorted(set(live) - set(absorbed))
    if prior is not None and not new:
        return {
            "mode": "noop",
            "files_read": 0,
            "state_version": prior["version"],
            "source_version": lake["version"],
        }

    delta = _read_manifest_files(spark, lake_path, lake["schema"], new)
    partial = delta.groupBy(*keys).agg(*agg_cols)
    if prior is None:
        merged = partial
    else:
        prev = _read_manifest_files(
            spark,
            state_path,
            prior["schema"],
            sorted(r for g in prior["files"].values() for r in g),
        ).select(*keys, "n_rows", *[f"sum_{c}" for c in sums])
        merged = prev.unionByName(partial).groupBy(*keys).agg(*merge_cols)
    v = snapshot_overwrite(
        spark,
        merged,
        state_path,
        state_partition_col,
        txn={"absorbed": live, "source_version": lake["version"]},
    )
    return {
        "mode": "incremental",
        "files_read": len(new),
        "state_version": v,
        "source_version": lake["version"],
    }


def snapshot_changed_partitions(
    spark: SparkSession, path: str, v_old: int, v_new: int
) -> list[str]:
    """Partitions whose manifest file lists differ between two versions.

    Pure metadata — no data files are opened. A partition with an identical
    file list is byte-identical content (files are immutable), so any
    version-to-version comparison may skip it entirely.
    """
    m1 = _resolve_manifest(spark, path, version=v_old)
    m2 = _resolve_manifest(spark, path, version=v_new)
    f1 = {p: sorted(rels) for p, rels in m1["files"].items()}
    f2 = {p: sorted(rels) for p, rels in m2["files"].items()}
    return sorted(p for p in set(f1) | set(f2) if f1.get(p) != f2.get(p))


def snapshot_cdc(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level change feed between two snapshot versions: one row per key
    that was inserted, deleted, or updated (same-key rows whose non-key
    content hash matches are dropped as unchanged).

    The scan is pruned at MANIFEST level: only partitions whose file lists
    changed are read on either side (``snapshot_changed_partitions``) — at
    100 TB a nightly merge touching 1% of partitions makes the change feed
    cost 1% of a table scan, not 200%. Emits ``*key_cols, change
    ('insert'|'delete'|'update'), old_hash, new_hash``.
    """
    changed = set(snapshot_changed_partitions(spark, path, v_old, v_new))
    m1 = _resolve_manifest(spark, path, version=v_old)
    m2 = _resolve_manifest(spark, path, version=v_new)

    def side(m: dict[str, Any]) -> DataFrame:
        rels = sorted(
            rel
            for part, group in m["files"].items()
            if part in changed
            for rel in group
        )
        df = _read_manifest_files(spark, path, m["schema"], rels)
        rest = [c for c in df.columns if c not in key_cols]
        return df.select(
            *key_cols,
            F.md5(F.to_json(F.struct(*sorted(rest))).cast("binary")).alias("_h"),
        )

    old = side(m1).withColumnsRenamed({"_h": "old_hash"})
    new = side(m2).withColumnsRenamed({"_h": "new_hash"})
    joined = old.join(new, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("old_hash").isNull(), "insert")
        .when(F.col("new_hash").isNull(), "delete")
        .otherwise("update")
        .alias("change"),
        "old_hash",
        "new_hash",
    ).filter(
        F.col("old_hash").isNull()
        | F.col("new_hash").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    )


def _footer_stats(
    data_dir: str, rels: list[str], cols: list[str]
) -> dict[str, dict[str, list[Any]]]:
    """Per-file [min, max] of ``cols`` from parquet footers (row-group stats
    folded to file level). Local-FS path here; on object stores the same
    footers are what a real table format's metrics collector reads."""
    import os as _os

    import pyarrow.parquet as pq

    out: dict[str, dict[str, list[Any]]] = {}
    for rel in rels:
        md = pq.ParquetFile(_os.path.join(data_dir, rel)).metadata
        arrow = md.schema.to_arrow_schema()
        per: dict[str, list[Any]] = {}
        for col in cols:
            idx = arrow.get_field_index(col)
            if idx < 0:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
            if mins:
                per[col] = [min(mins), max(maxs)]
        if per:
            out[rel] = per
    return out


def snapshot_append_with_stats(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
    stats_cols: list[str],
) -> int:
    """``snapshot_append`` that also records per-file zone maps (min/max of
    ``stats_cols``) in the manifest — Iceberg-style column metrics. Readers
    (``read_snapshot_pruned``) can then skip files from METADATA alone,
    before any data IO."""
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    try:
        current = _resolve_manifest(spark, path)
        files = {part: list(rels) for part, rels in current["files"].items()}
        stats = dict(current.get("stats", {}))
        parent = current["version"]
    except FileNotFoundError:
        files, stats, parent = {}, {}, None
    new = _append_data(spark, df, path, partition_col)
    new_rels = [rel for group in new.values() for rel in group]
    stats.update(_footer_stats(f"{path}/{_DATA_DIR}", new_rels, stats_cols))
    for part, rels in new.items():
        files.setdefault(part, []).extend(rels)
    version = (parent or 0) + 1
    payload: dict[str, Any] = {
        "version": version,
        "parent": parent,
        "operation": "append",
        "committed_at": time.time(),
        "schema": df.schema.json(),
        "files": {k: sorted(v) for k, v in files.items() if v},
        "stats": stats,
    }
    _write_json(spark, _manifest_path(path, version), payload)
    return version


def read_snapshot_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo: Any,
    hi: Any,
    version: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Read ``col BETWEEN lo AND hi`` skipping every file whose manifest
    zone map proves it cannot match (files without stats are kept —
    pruning is conservative). Returns (filtered df, {files_total,
    files_read}); the residual filter still applies row-level, so results
    equal a full-scan filter exactly."""
    m = _resolve_manifest(spark, path, version=version)
    stats = m.get("stats", {})
    rels_all = sorted(rel for group in m["files"].values() for rel in group)
    keep = []
    for rel in rels_all:
        s = stats.get(rel, {}).get(col)
        if s is None or not (s[1] < lo or s[0] > hi):
            keep.append(rel)
    df = _read_manifest_files(spark, path, m["schema"], keep)
    return (
        df.filter((F.col(col) >= lo) & (F.col(col) <= hi)),
        {"files_total": len(rels_all), "files_read": len(keep)},
    )


# ---------------------------------------------------------------------------
# Per-file Bloom filters: point-predicate file skipping.
#
# Zone maps (``snapshot_append_with_stats``) prune RANGE predicates, but only
# when the writer clustered the column — a hash-distributed high-cardinality
# key (user_id, doc fingerprint) has every file spanning ~the full value
# range, so its zone map prunes nothing. A per-file Bloom bitset answers the
# complementary question "can value v be in this file at all?" from metadata
# alone, which is how Parquet bloom filters / Iceberg's bloom metrics make
# point lookups on 100 TB touch a handful of files. The bitset is built
# DISTRIBUTED (one narrow scan of only the newly appended files, aggregated
# per file — never a driver re-read of data), and only the m-bit sets (m/8
# bytes per file per column) are collected into the manifest.
# ---------------------------------------------------------------------------
_BLOOM_M_BITS = 1024
_BLOOM_K = 3


def _bloom_positions_py(value: Any, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of the Spark position expression: md5 of
    ``f"{value}:{j}"`` (value rendered via Spark's CAST-to-STRING rules for
    int/string) → first 8 hex digits → uint32 → mod m."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}:{j}".encode("utf-8")).hexdigest()[:8], 16) % m_bits
        for j in range(k)
    ]


def _bloom_pos_exprs(col: str, m_bits: int, k: int) -> list[F.Column]:
    """The k bit positions of ``col`` as Spark expressions (JVM-side md5 —
    bit-identical to :func:`_bloom_positions_py`)."""
    return [
        F.expr(
            f"CAST(conv(substr(md5(concat(CAST({col} AS STRING), ':', '{j}')),"
            f" 1, 8), 16, 10) AS BIGINT) % {m_bits}"
        )
        for j in range(k)
    ]


def snapshot_append_with_blooms(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
    bloom_cols: list[str],
    m_bits: int = _BLOOM_M_BITS,
    k: int = _BLOOM_K,
) -> int:
    """``snapshot_append`` that also records a per-file Bloom bitset of each
    ``bloom_cols`` column in the manifest.

    The bitset build is a single distributed pass over ONLY the new files:
    scan → k narrow position expressions per value → per-file
    ``collect_set`` (bounded by m distinct positions, so the aggregate state
    is metadata-sized regardless of file row count) → tiny driver collect of
    one position-set per (file, column). Use for high-cardinality point-
    lookup keys; use zone maps for range-clustered columns.
    """
    try:
        current = _resolve_manifest(spark, path)
        files = {part: list(rels) for part, rels in current["files"].items()}
        blooms = dict(current.get("blooms", {}))
        parent = current["version"]
    except FileNotFoundError:
        files, blooms, parent = {}, {}, None
    new = _append_data(spark, df, path, partition_col)
    new_rels = sorted(rel for group in new.values() for rel in group)
    data_dir = f"{path}/{_DATA_DIR}"
    scan = (
        spark.read.option("basePath", data_dir)
        .parquet(*[f"{data_dir}/{rel}" for rel in new_rels])
        .select(F.col("_metadata.file_path").alias("_fp"), *bloom_cols)
    )
    for col in bloom_cols:
        rows = (
            scan.where(F.col(col).isNotNull())
            .select("_fp", F.explode(F.array(*_bloom_pos_exprs(col, m_bits, k))).alias("pos"))
            .groupBy("_fp")
            .agg(F.collect_set("pos").alias("ps"))
            .collect()
        )
        marker = f"/{_DATA_DIR}/"
        for r in rows:
            rel = urllib.parse.unquote(r["_fp"].split(marker, 1)[1])
            bits = bytearray(m_bits // 8)
            for p in r["ps"]:
                bits[p >> 3] |= 1 << (p & 7)
            blooms.setdefault(rel, {})[col] = {
                "m": m_bits,
                "k": k,
                "hex": bytes(bits).hex(),
            }
    for part, rels in new.items():
        files.setdefault(part, []).extend(rels)
    return _commit(
        spark,
        path,
        files,
        "append",
        df.schema.json(),
        parent,
        blooms=blooms,
    )


def snapshot_overwrite_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
) -> int:
    """Dynamic-partition overwrite as a snapshot commit: ONLY the partitions
    present in ``df`` are replaced (their old files drop out of the new
    manifest — never deleted from disk, so time travel keeps working);
    every other partition carries by reference with zero IO. The backfill
    primitive: recompute one bad day and republish it atomically without
    touching the other 10,000 days."""
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    current = _resolve_manifest(spark, path)
    files = {part: list(rels) for part, rels in current["files"].items()}
    new = _append_data(spark, df, path, partition_col)
    for part, rels in new.items():
        files[part] = list(rels)  # replace, not extend
    return _commit(
        spark,
        path,
        files,
        "overwrite-partitions",
        df.schema.json(),
        current["version"],
    )


def snapshot_append_constrained(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
    checks: dict[str, str],
    quarantine_col: str = "_violated",
) -> tuple[int, DataFrame]:
    """Write-side constraint enforcement (Delta-style CHECK constraints):
    rows passing every ``checks`` predicate commit to the table; violating
    rows never enter it and are returned as a quarantine DataFrame carrying
    the list of violated check names. The table stays trustworthy by
    CONSTRUCTION — readers never need the cleansing filter — and the
    quarantine keeps the rejects auditable instead of silently dropped.
    Returns (new_version, quarantine_df)."""
    conds = {name: F.expr(sql) for name, sql in checks.items()}
    violated = F.filter(
        F.array(
            *[
                F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in conds.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn(quarantine_col, violated)
    valid = tagged.filter(F.size(quarantine_col) == 0).drop(quarantine_col)
    quarantine = tagged.filter(F.size(quarantine_col) > 0)
    version = snapshot_append(spark, valid, path, partition_col=partition_col)
    return version, quarantine


def snapshot_append_counted(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
) -> int:
    """``snapshot_append`` that records per-file ROW COUNTS in the manifest
    (parquet footer metadata — no data pages read). Aggregate questions the
    counts answer (``count(*)``, per-partition counts) then cost zero data
    IO at any table size: the manifest IS the answer."""
    try:
        current = _resolve_manifest(spark, path)
        files = {part: list(rels) for part, rels in current["files"].items()}
        counts = dict(current.get("row_counts", {}))
        parent = current["version"]
    except FileNotFoundError:
        files, counts, parent = {}, {}, None
    new = _append_data(spark, df, path, partition_col)
    import os as _os

    import pyarrow.parquet as pq

    data_dir = f"{path}/{_DATA_DIR}"
    for group in new.values():
        for rel in group:
            counts[rel] = pq.ParquetFile(
                _os.path.join(data_dir, rel)
            ).metadata.num_rows
    for part, rels in new.items():
        files.setdefault(part, []).extend(rels)
    version = (parent or 0) + 1
    payload: dict[str, Any] = {
        "version": version,
        "parent": parent,
        "operation": "append",
        "committed_at": time.time(),
        "schema": df.schema.json(),
        "files": {k: sorted(v) for k, v in files.items() if v},
        "row_counts": counts,
    }
    _write_json(spark, _manifest_path(path, version), payload, if_absent=True)
    return version


def snapshot_partition_counts(
    spark: SparkSession, path: str, version: int | None = None
) -> list[tuple[str, int]]:
    """Per-partition row counts from the manifest ALONE — zero data IO.
    Raises if any referenced file lacks a recorded count (a mixed-writer
    table can't answer from metadata; fall back to a scan)."""
    m = _resolve_manifest(spark, path, version=version)
    counts = m.get("row_counts", {})
    out: list[tuple[str, int]] = []
    for part, rels in sorted(m["files"].items()):
        total = 0
        for rel in rels:
            if rel not in counts:
                raise KeyError(f"no row count recorded for {rel}")
            total += int(counts[rel])
        out.append((part, total))
    return out


def read_snapshot_point(
    spark: SparkSession,
    path: str,
    col: str,
    value: Any,
    version: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Read ``col = value`` skipping every file whose Bloom bitset proves the
    value absent (files without a bloom for ``col`` are kept — pruning is
    conservative, so mixed bloom/plain commits stay correct). The residual
    equality filter still applies row-level, so results equal a full-scan
    filter exactly — Bloom false positives cost IO, never correctness."""
    m = _resolve_manifest(spark, path, version=version)
    blooms = m.get("blooms", {})
    rels_all = sorted(rel for group in m["files"].values() for rel in group)
    keep = []
    for rel in rels_all:
        b = blooms.get(rel, {}).get(col)
        if b is None:
            keep.append(rel)
            continue
        bits = bytes.fromhex(b["hex"])
        if all(
            bits[p >> 3] & (1 << (p & 7))
            for p in _bloom_positions_py(value, b["m"], b["k"])
        ):
            keep.append(rel)
    df = _read_manifest_files(spark, path, m["schema"], keep)
    return (
        df.filter(F.col(col) == F.lit(value)),
        {"files_total": len(rels_all), "files_read": len(keep)},
    )


# ---------------------------------------------------------------------------
# Branches: named refs with isolated commit lines and fast-forward merge.
#
# The git-for-data workflow (Nessie / LakeFS / Iceberg branches) on the same
# manifest layer: a branch is a named pointer to a base MAIN version plus its
# own commit line under ``_snapshots/branches/<name>/``. Branch writers never
# touch main's manifests, so main readers are perfectly isolated from
# in-progress branch work; data files stay append-only and SHARED (a merge
# moves references, never bytes). Merge is fast-forward-only: it publishes
# the branch head's file map as the next main version IFF main still sits at
# the branch base — anything else raises SnapshotConflictError, because
# silently union-merging diverged file maps could resurrect rows a main
# MERGE/delete removed.
# ---------------------------------------------------------------------------
def _branch_dir(path: str, name: str) -> str:
    return f"{path}/{_MANIFEST_DIR}/branches/{name}"


def _branch_history(spark: SparkSession, path: str, name: str) -> list[dict[str, Any]]:
    bdir = _branch_dir(path, name)
    fs = _fs(spark, bdir)
    if not fs.exists(_jpath(spark, bdir)):
        return []
    out = []
    it = fs.listFiles(_jpath(spark, bdir), False)
    names = []
    while it.hasNext():
        nm = str(it.next().getPath().getName())
        if nm.startswith("v") and nm.endswith(".json"):
            names.append(nm)
    for nm in sorted(names):
        out.append(_read_json(spark, f"{bdir}/{nm}"))
    return out


def branch_create(
    spark: SparkSession, path: str, name: str, version: int | None = None
) -> int:
    """Create branch ``name`` at main version ``version`` (default: latest).
    The branch's first manifest is a zero-delta copy of the base file map,
    stamped with the base version it forked from."""
    base = _resolve_manifest(spark, path, version=version)
    payload = {
        "version": 1,
        "parent": None,
        "base_main_version": base["version"],
        "operation": "branch-create",
        "committed_at": time.time(),
        "schema": base["schema"],
        "files": base["files"],
    }
    _write_json(spark, f"{_branch_dir(path, name)}/v{1:08d}.json", payload, if_absent=True)
    return base["version"]


def branch_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    name: str,
    partition_col: str = "metric_date",
) -> int:
    """Append to branch ``name``: new data files land in the shared data dir,
    but the manifest commit goes to the branch's own line — main is never
    touched."""
    hist = _branch_history(spark, path, name)
    if not hist:
        raise FileNotFoundError(f"no branch {name!r} at {path}")
    head = hist[-1]
    if partition_col not in df.columns:
        df = df.withColumn(partition_col, F.to_date("ts"))
    files = {part: list(rels) for part, rels in head["files"].items()}
    for part, rels in _append_data(spark, df, path, partition_col).items():
        files.setdefault(part, []).extend(rels)
    version = head["version"] + 1
    payload = {
        "version": version,
        "parent": head["version"],
        "base_main_version": head["base_main_version"],
        "operation": "branch-append",
        "committed_at": time.time(),
        "schema": df.schema.json(),
        "files": {k: sorted(v) for k, v in files.items() if v},
    }
    _write_json(
        spark, f"{_branch_dir(path, name)}/v{version:08d}.json", payload, if_absent=True
    )
    return version


def read_branch(spark: SparkSession, path: str, name: str) -> DataFrame:
    hist = _branch_history(spark, path, name)
    if not hist:
        raise FileNotFoundError(f"no branch {name!r} at {path}")
    head = hist[-1]
    rels = sorted(rel for group in head["files"].values() for rel in group)
    return _read_manifest_files(spark, path, head["schema"], rels)


def branch_fast_forward(spark: SparkSession, path: str, name: str) -> int:
    """Publish the branch head as the next MAIN version — allowed only while
    main still sits at the branch's fork base (fast-forward). A diverged
    main raises SnapshotConflictError: rebase (re-branch + re-apply) instead
    of a silent union that could resurrect rows main since removed."""
    hist = _branch_history(spark, path, name)
    if not hist:
        raise FileNotFoundError(f"no branch {name!r} at {path}")
    head = hist[-1]
    main = _resolve_manifest(spark, path)
    if main["version"] != head["base_main_version"]:
        raise SnapshotConflictError(
            f"main advanced v{head['base_main_version']} -> v{main['version']} "
            f"since branch {name!r} forked; fast-forward impossible"
        )
    return _commit(
        spark,
        path,
        {k: list(v) for k, v in head["files"].items()},
        f"merge-branch:{name}",
        head["schema"],
        main["version"],
    )


def read_snapshot_evolved(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partition_filters: dict[str, Any] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Read a table whose commits used DIFFERENT partition columns
    (partition-spec evolution): files keep the layout they were written
    under, and the reader unions one scan per spec group.

    Iceberg's headline evolution feature, recovered from the manifest alone:
    each file's relpath prefix (``col=value/``) names the spec it was
    written under, so no rewrite ever accompanies a spec change. Partition
    filters prune at dir level within the groups partitioned by that column
    and are conservative (keep everything) for groups partitioned by a
    different column; every filter is then re-applied row-level, so results
    equal a full-scan filter exactly. ``unionByName`` keeps the merge
    correct even if commits also widened the schema."""
    m = _resolve_manifest(spark, path, version=version)
    rels_all = sorted(rel for group in m["files"].values() for rel in group)
    groups: dict[str, list[str]] = {}
    for rel in rels_all:
        first = rel.split("/", 1)[0]
        spec = first.split("=", 1)[0] if "=" in first else ""
        groups.setdefault(spec, []).append(rel)
    filters = dict(partition_filters or {})
    parts: list[DataFrame] = []
    n_read = 0
    for spec, rels in sorted(groups.items()):
        if spec in filters:
            want = str(filters[spec])
            rels = [
                rel
                for rel in rels
                if urllib.parse.unquote(rel.split("/", 1)[0].split("=", 1)[1])
                == want
            ]
        if not rels:
            continue
        n_read += len(rels)
        parts.append(_read_manifest_files(spark, path, m["schema"], rels))
    if not parts:
        df = _read_manifest_files(spark, path, m["schema"], [])
    else:
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
    for col, value in filters.items():
        df = df.filter(F.col(col) == F.lit(value))
    return df, {"files_total": len(rels_all), "files_read": n_read}


def snapshot_delete(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str = "metric_date",
) -> int:
    """Row-level delete (right-to-be-forgotten erasure) as a new snapshot
    commit: partitions holding ANY matching key are rewritten without those
    rows (anti-join against the broadcast key set); every other partition is
    carried into the new manifest by reference — zero IO. A touched
    partition whose every row matches simply disappears from the manifest.

    At 100 TB an erasure batch touching 1% of partitions costs a 1% rewrite,
    the same manifest-pruning contract as :func:`snapshot_merge`; the old
    version remains readable via time travel until :func:`vacuum_snapshots`
    retires it (retention policy decides when erasure becomes physical).
    """
    m = _resolve_manifest(spark, path)
    existing = read_snapshot(spark, path, version=m["version"])
    k = keys.select(*key_cols).distinct()
    # Touched partitions are identified by their ON-DISK directory name
    # (via the file-metadata column), not by formatting partition VALUES —
    # Spark escapes special characters (space, ':', '/') in partition paths,
    # so a hand-built f"{col}={value}" string would miss the manifest key
    # and leave the old files referenced alongside the rewritten rows.
    # ``file_path`` is a URI (one extra percent-encoding layer over the
    # on-disk name); one unquote restores the manifest key exactly.
    with_dir = existing.withColumn(
        "_pdir", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -2)
    )
    touched_uri_dirs = {
        r[0]
        for r in with_dir.join(F.broadcast(k), key_cols, "leftsemi")
        .select("_pdir")
        .distinct()
        .collect()
    }
    touched_dirs = {urllib.parse.unquote(d) for d in touched_uri_dirs}
    kept = (
        with_dir.filter(F.col("_pdir").isin(list(touched_uri_dirs)))
        .drop("_pdir")
        .join(F.broadcast(k), key_cols, "left_anti")
    )
    new_files = _append_data(spark, kept, path, partition_col)
    files = {
        part: rels
        for part, rels in m["files"].items()
        if part not in touched_dirs
    }
    files.update(new_files)
    return _commit(spark, path, files, "delete", existing.schema.json(), m["version"])


def snapshot_column_stats(
    spark: SparkSession, path: str, col: str, version: int | None = None
) -> list[tuple[str, str, Any, Any]]:
    """Manifest-only view of the per-file zone maps recorded by
    :func:`snapshot_append_with_stats`: ``(partition, rel, min, max)`` per
    data file carrying stats for ``col``. O(manifest) — no data IO; what a
    clustering-quality audit reads."""
    m = _resolve_manifest(spark, path, version=version)
    stats = m.get("stats", {})
    out: list[tuple[str, str, Any, Any]] = []
    for part, rels in m["files"].items():
        for rel in rels:
            s = stats.get(rel, {}).get(col)
            if s is not None:
                out.append((part, rel, s[0], s[1]))
    return out
