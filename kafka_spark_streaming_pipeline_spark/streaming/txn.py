"""Crash-atomic parquet tables via a commit-marker protocol.

The reference gets mutation atomicity from MongoDB document upserts
(spark_job/spark_streaming.py:322-337) — a mid-crash leaves the
previous document, never a torn table.  Plain ``mode("overwrite")``
parquet has no such guarantee: a failure between delete and rewrite
loses the live table.  This module closes that window with the same
mechanism Delta Lake uses on HDFS-compatible storage, re-implemented
on nothing but the Hadoop ``FileSystem`` API that ships with Spark:

- Data files are IMMUTABLE: every commit writes a fresh
  ``data/<uuid>/`` directory and never touches existing ones.
- A commit is ONE atomic operation: rename of a fully-written
  manifest to ``_commits/<version>.json``.  Hadoop ``rename`` is
  atomic and fails if the destination exists, so it doubles as
  put-if-absent — two racing writers produce one winner and one
  clean ``ConcurrentWriteError`` (optimistic concurrency, exactly
  Delta's HDFS LogStore contract).  On S3, rename is not atomic and
  this needs an external put-if-absent coordinator (as Delta's S3
  LogStore does); the protocol itself is unchanged.
- Readers resolve the highest committed version and read ONLY the
  directories its manifest lists.  A writer crash at any point before
  the rename leaves garbage data dirs that no manifest references —
  invisible to every reader, reclaimed by ``vacuum``.

Partitioned tables get copy-on-write at PARTITION granularity: an
upsert rewrites only the partitions the batch touches into the new
commit dir, and the manifest re-points those partitions while all
others keep referencing older commit dirs — O(touched partitions)
per batch at 100 TB, same as a Delta/Iceberg MERGE with dynamic
partition overwrite.

All path probing goes through the Hadoop FileSystem API, so the table
works on any scheme Spark can reach (file://, hdfs://, s3a://...) —
never ``os.path``, which silently reports False for remote stores.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_COMMITS = "_commits"
_DATA = "data"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer was preparing."""


class _FS:
    """Thin Hadoop FileSystem wrapper (scheme-agnostic path ops)."""

    def __init__(self, spark: SparkSession, path: str):
        self._jvm = spark._jvm
        self.fs = self._jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return self.fs.exists(self.path(p))

    def write_text(self, p: str, text: str) -> None:
        out = self.fs.create(self.path(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, p: str) -> str:
        stream = self.fs.open(self.path(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def rename(self, src: str, dst: str) -> bool:
        return self.fs.rename(self.path(src), self.path(dst))

    def list_names(self, p: str) -> list[str]:
        if not self.exists(p):
            return []
        return [s.getPath().getName() for s in self.fs.listStatus(self.path(p))]

    def delete(self, p: str) -> None:
        self.fs.delete(self.path(p), True)


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe that works on any Hadoop-reachable scheme."""
    return _FS(spark, path).exists(path)


def _commit_name(version: int) -> str:
    return f"{version:020d}.json"


def _publish(fs: _FS, root: str, version: int, manifest: dict) -> None:
    """The ONE atomic step: fully write the manifest to a temp name,
    then rename it to its version slot.  Rename-if-absent is the
    put-if-absent commit primitive; losing the race raises instead of
    clobbering the winner."""
    fs.fs.mkdirs(fs.path(f"{root}/{_COMMITS}"))
    tmp = f"{root}/{_COMMITS}/_tmp-{uuid.uuid4().hex}.json"
    final = f"{root}/{_COMMITS}/{_commit_name(version)}"
    fs.write_text(tmp, json.dumps(manifest))
    if not fs.rename(tmp, final):
        fs.delete(tmp)
        raise ConcurrentWriteError(
            f"version {version} of {root} was committed by another writer"
        )


class AtomicParquetTable:
    """A parquet table whose every mutation is an atomic commit.

    ``partition_col`` set   -> partition-granular copy-on-write
    (``upsert``); unset -> append-log mode (``append`` /
    ``overwrite``), the merge-on-read shape used by the live sink.
    """

    #: upsert() collects the batch's distinct partition values to the
    #: driver to compute the COW entry list; this cap turns the implicit
    #: assumption ("a batch touches few partitions") into a loud
    #: contract instead of an unbounded driver materialization.  The
    #: live sink's fixed 64-bucket hash partitioning keeps real batches
    #: far below the default.
    DEFAULT_MAX_TOUCHED_PARTITIONS = 10_000

    def __init__(
        self,
        root: str,
        partition_col: str | None = None,
        max_touched_partitions: int = DEFAULT_MAX_TOUCHED_PARTITIONS,
    ):
        self.root = root.rstrip("/")
        self.partition_col = partition_col
        self.max_touched_partitions = max_touched_partitions

    # ------------------------------------------------------------ resolve

    def _resolve(self, fs: _FS) -> tuple[int, dict | None]:
        names = fs.list_names(f"{self.root}/{_COMMITS}")
        versions = [
            int(n[:-5]) for n in names if n.endswith(".json") and n[:-5].isdigit()
        ]
        if not versions:
            return 0, None
        v = max(versions)
        return v, json.loads(fs.read_text(f"{self.root}/{_COMMITS}/{_commit_name(v)}"))

    def version(self, spark: SparkSession) -> int:
        return self._resolve(_FS(spark, self.root))[0]

    # --------------------------------------------------------------- read

    def read(
        self,
        spark: SparkSession,
        partition_values: list | None = None,
        version: int | None = None,
    ) -> DataFrame | None:
        """The latest committed snapshot; ``None`` if nothing committed.

        ``version`` time-travels to an older commit: every commit file
        is immutable and data dirs are copy-on-write, so any version
        not yet vacuumed reads exactly as it was published (the same
        mechanism as Delta's VERSION AS OF).  Raises KeyError for a
        version that never existed or whose commit was vacuumed.

        ``partition_values`` prunes at MANIFEST level — only commit
        dirs owning a wanted partition are even listed, and within a
        dir only the wanted ``col=value`` subdirectories are read
        (the file-listing analogue of partition pruning)."""
        fs = _FS(spark, self.root)
        if version is None:
            _, manifest = self._resolve(fs)
        else:
            commit = f"{self.root}/{_COMMITS}/{_commit_name(version)}"
            if not fs.exists(commit):
                raise KeyError(
                    f"version {version} does not exist at {self.root} "
                    "(never committed, or vacuumed)"
                )
            manifest = json.loads(fs.read_text(commit))
        if manifest is None:
            return None
        wanted = (
            None if partition_values is None else {str(v) for v in partition_values}
        )
        parts: list[DataFrame] = []
        for entry in manifest["entries"]:
            d = f"{self.root}/{entry['dir']}"
            if entry["partitions"] is None:
                parts.append(spark.read.parquet(d))
                continue
            owned = entry["partitions"] if wanted is None else sorted(
                wanted.intersection(entry["partitions"])
            )
            if not owned:
                continue
            pcol = manifest["partition_col"]
            parts.append(
                spark.read.option("basePath", d).parquet(
                    *[f"{d}/{pcol}={v}" for v in owned]
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ------------------------------------------------------------- append

    def append(self, df: DataFrame) -> int:
        """Commit ``df`` as new immutable files alongside the existing
        ones (merge-on-read log append).  O(batch) work, crash-atomic."""
        spark = df.sparkSession
        fs = _FS(spark, self.root)
        version, manifest = self._resolve(fs)
        rel = f"{_DATA}/{uuid.uuid4().hex[:12]}"
        df.write.parquet(f"{self.root}/{rel}")
        entries = (manifest["entries"] if manifest else []) + [
            {"dir": rel, "partitions": None}
        ]
        _publish(
            fs,
            self.root,
            version + 1,
            {"version": version + 1, "partition_col": self.partition_col, "entries": entries},
        )
        return version + 1

    def overwrite(self, df: DataFrame, expect_version: int | None = None) -> int:
        """Atomically replace the whole table content (compaction /
        full rewrite).  Old dirs stay until ``vacuum`` — a reader that
        resolved the previous version keeps a consistent snapshot.

        ``expect_version`` makes the replace a compare-and-swap: the
        new manifest publishes at ``expect_version + 1``, and if any
        writer committed that slot in the meantime ``_publish``'s
        rename-if-absent raises ConcurrentWriteError and the table is
        untouched — the guard compaction needs so a concurrently
        appended batch can never be silently dropped by a fold computed
        from an older snapshot."""
        spark = df.sparkSession
        fs = _FS(spark, self.root)
        if expect_version is not None:
            version = expect_version
        else:
            version, _ = self._resolve(fs)
        rel = f"{_DATA}/{uuid.uuid4().hex[:12]}"
        df.write.parquet(f"{self.root}/{rel}")
        _publish(
            fs,
            self.root,
            version + 1,
            {
                "version": version + 1,
                "partition_col": self.partition_col,
                "entries": [{"dir": rel, "partitions": None}],
            },
        )
        return version + 1

    # ------------------------------------------------------------- upsert

    def upsert(
        self, batch_df: DataFrame, keys: list[str], order_col: str | None = None
    ) -> int:
        """MERGE keyed on ``keys``: last row per key in the batch wins
        (ordered by ``order_col``), existing rows of TOUCHED partitions
        are carried over minus replaced keys, untouched partitions are
        re-pointed, and the whole thing becomes visible in one commit.

        The touched-partition list is collected to the driver — it is
        bounded by the partition key's cardinality per batch (the live
        sink uses a fixed 64-bucket hash partition precisely so this
        stays O(64) at any scale, see sinks.with_partition_bucket)."""
        if self.partition_col is None:
            raise ValueError("upsert requires a partition_col")
        pcol = self.partition_col
        spark = batch_df.sparkSession
        fs = _FS(spark, self.root)
        version, manifest = self._resolve(fs)

        order = (
            F.col(order_col).desc() if order_col else F.monotonically_increasing_id().desc()
        )
        w = W.partitionBy(*keys).orderBy(order)
        deduped = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        # cap the driver-side list BEFORE collecting: limit(n+1) bounds
        # the transfer, and exceeding the cap fails loudly instead of
        # materializing an arbitrarily long partition list
        cap = self.max_touched_partitions
        touched_rows = deduped.select(pcol).distinct().limit(cap + 1).collect()
        if len(touched_rows) > cap:
            raise ValueError(
                f"batch touches > {cap} distinct {pcol!r} partitions; "
                "repartition the sink key (e.g. hash-bucket it) or raise "
                "max_touched_partitions"
            )
        touched = sorted(str(r[0]) for r in touched_rows)
        existing = self.read(spark, partition_values=touched) if manifest else None
        if existing is not None:
            kept = existing.join(deduped.select(*keys).distinct(), keys, "left_anti")
            out = kept.unionByName(deduped, allowMissingColumns=True)
        else:
            out = deduped

        rel = f"{_DATA}/{uuid.uuid4().hex[:12]}"
        out.write.partitionBy(pcol).parquet(f"{self.root}/{rel}")

        entries = [{"dir": rel, "partitions": touched}]
        for entry in manifest["entries"] if manifest else []:
            remaining = (
                None
                if entry["partitions"] is None
                else [p for p in entry["partitions"] if p not in set(touched)]
            )
            if remaining is None or remaining:
                entries.append({"dir": entry["dir"], "partitions": remaining})
        _publish(
            fs,
            self.root,
            version + 1,
            {"version": version + 1, "partition_col": pcol, "entries": entries},
        )
        return version + 1

    # ------------------------------------------------------------- vacuum

    def vacuum(self, spark: SparkSession) -> list[str]:
        """Delete data dirs unreferenced by the LATEST manifest and all
        superseded commit files.  Safe once no reader still holds an
        older snapshot (the caller's retention decision, as with
        Delta's VACUUM)."""
        fs = _FS(spark, self.root)
        version, manifest = self._resolve(fs)
        if manifest is None:
            return []
        live = {e["dir"].split("/", 1)[1] for e in manifest["entries"]}
        removed = []
        for name in fs.list_names(f"{self.root}/{_DATA}"):
            if name not in live:
                fs.delete(f"{self.root}/{_DATA}/{name}")
                removed.append(name)
        for name in fs.list_names(f"{self.root}/{_COMMITS}"):
            keep = name == _commit_name(version)
            if not keep and (name.endswith(".json")):
                fs.delete(f"{self.root}/{_COMMITS}/{name}")
        return removed


def snapshot_diff(
    spark: SparkSession,
    table: "AtomicParquetTable",
    keys: list[str],
    v_old: int,
    v_new: int | None = None,
) -> DataFrame:
    """Row-level diff between two committed snapshots (the audit
    companion to time travel — Delta's CDF shape computed after the
    fact): one row per changed key with ``change`` in
    ('inserted', 'deleted', 'updated').

    Works on any two not-yet-vacuumed versions because commits are
    immutable.  Scale shape: ONE full-outer join keyed on ``keys``
    (hash-spread, map-side combinable md5 row digests computed below
    the join), so the cost is a single co-partitioned shuffle of the
    two snapshots — never a collect, never per-row Python.  Rows
    whose digests match are dropped BEFORE the output (unchanged keys
    never leave the join stage)."""
    old = table.read(spark, version=v_old)
    new = table.read(spark, version=v_new) if v_new is not None else table.read(spark)
    if old is None or new is None:
        raise FileNotFoundError(f"missing snapshot(s) at {table.root}")

    def digested(df: DataFrame, tag: str) -> DataFrame:
        non_key = [c for c in df.columns if c not in keys]
        # NULL-sensitive encoding: concat_ws silently drops nulls AND
        # their separators, so ('x', NULL) and (NULL, 'x') would hash
        # identically; tag every cell with a null marker first
        cells = [
            F.when(F.col(c).isNull(), F.lit("\x00"))
            .otherwise(F.concat(F.lit("\x01"), F.col(c).cast("string")))
            for c in non_key
        ]
        digest = F.md5(F.concat_ws("\x1f", *cells))
        return df.select(*keys, digest.alias(f"__d_{tag}"))

    j = digested(old, "old").join(digested(new, "new"), keys, "full_outer")
    change = (
        F.when(F.col("__d_old").isNull(), F.lit("inserted"))
        .when(F.col("__d_new").isNull(), F.lit("deleted"))
        .when(F.col("__d_old") != F.col("__d_new"), F.lit("updated"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )
