"""Transactional partitioned parquet table with an Iceberg-style commit log.

The image has no Iceberg/Delta runtime jar, so the engine ships its own
minimal table format with the same *semantics* the reference relies on:

- snapshot isolation via an append-only log of immutable version files
  (``_log/v%012d.json``) — no log replay. Two manifest layouts: FULL
  inline snapshot (default; fine to ~10^5 file entries) or the
  Iceberg-style **manifest-list split** (``manifest_split`` property):
  per-partition content-addressed blobs under ``_log/manifests/``, so
  a commit rewrites O(touched partitions) manifest bytes and a pruned
  read loads only its partitions' blobs (see Snapshot docstring);
- atomic commits through a pluggable ``CommitProtocol`` (create-if-
  absent of the next version file; POSIX ``O_CREAT|O_EXCL`` default,
  object-store variants documented on the class); losers re-read the
  fresh snapshot, rebase their partition-level changes, and retry with
  exponential backoff + jitter — the same protocol as the reference's
  Iceberg committer
  (reference: radiant/tasks/iceberg/utils.py:61-96 ``commit_files``);
- partition-scoped copy-on-write replace (``overwrite_partitions``) —
  the reference's copy-unchanged + insert-delta + atomic partition swap
  (reference: radiant/tasks/starrocks/operator.py:282-355) collapses to
  "rewrite only touched partitions, swap manifest pointers";
- additive schema evolution: the snapshot carries the authoritative
  schema; old data files missing newer columns read back as NULL
  because scans always pass the snapshot schema explicitly
  (reference analog: migrations adding columns, SURVEY.md §1.2);
- exactly-once change application: the snapshot records
  ``applied[source_id] = last_epoch`` so replaying a micro-batch is a
  manifest-level no-op (reference analog: the ``ingested_at`` watermark
  advanced post-run, radiant/dags/sql/radiant/sequencing_experiment_update.sql:1-3).

Scale notes (100 TB / 1000 executors):
- Data files are written by Spark executors in parallel
  (``partitionBy`` layout); only the manifest swap is driver-side.
- The inline manifest holds ~10^5 file entries comfortably; the split
  layout (used by the CDC sink) scales past that: manifest write cost
  per commit is O(touched partitions), read cost follows pruning, and
  compaction bounds files/bucket so each blob stays small.
- Partition values are hash buckets of the merge key, so commit
  conflicts between writers of disjoint buckets rebase cleanly.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_log"
_DATA_DIR = "data"
_PB_COL = "_pb"  # directory-layout duplicate of the partition column
MAX_COMMIT_RETRIES = 20


class CommitConflict(RuntimeError):
    """Raised when the optimistic commit loses MAX_COMMIT_RETRIES times."""


class CommitProtocol:
    """The ONE primitive the lake's transactionality rests on:
    *publish these bytes under this name atomically, or fail if the
    name exists* (plus durable reads and a name listing). Everything
    else — snapshot isolation, optimistic rebase, partition-replace
    validation — is layered on top and backend-agnostic.

    ``PosixCommitProtocol`` (default) implements it with
    O_CREAT|O_EXCL + fsync + hard link — valid on any POSIX
    filesystem, NOT on S3. An object-store deployment substitutes one
    of (all industry-standard, none available in this sandbox):

    - conditional PUT (S3 ``If-None-Match: *``, GCS
      ``x-goods-if-generation-match: 0`` analog) — same contract;
    - a catalog/locking service holding the latest-version pointer
      (Iceberg's REST catalog or DynamoDB commit lock — the
      reference's own committer goes through a catalog,
      radiant/tasks/iceberg/utils.py:61-96).

    ``list_names`` must be strongly consistent for correctness of
    ``latest_version`` (S3 LIST is strongly consistent since 2020)."""

    def publish(self, target: str, data: bytes) -> None:
        """Atomically create ``target`` with ``data``; raise
        FileExistsError if it already exists (the commit race)."""
        raise NotImplementedError

    def read(self, target: str) -> str:
        raise NotImplementedError

    def list_names(self, directory: str) -> list[str]:
        raise NotImplementedError

    def delete(self, target: str) -> None:
        """Remove a published name (snapshot expiry / blob GC only —
        never called on the path a concurrent commit could be
        publishing)."""
        raise NotImplementedError

    def age_seconds(self, target: str) -> float | None:
        """Seconds since ``target`` was published, or None if unknown
        / not published. GC (vacuum) uses this for its grace window —
        age MUST come through the protocol: protocol-managed objects
        (manifest blobs on an object store) have no local-filesystem
        mtime, and a local stat would make every blob look eternally
        in-flight (never GC'd). The conservative default (None =
        unknown) makes vacuum KEEP the object; override to enable
        blob GC."""
        return None


class PosixCommitProtocol(CommitProtocol):
    def publish(self, target: str, data: bytes) -> None:
        tmp = f"{target}.tmp-{uuid.uuid4().hex}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            off = 0
            while off < len(data):
                off += os.write(fd, data[off:])
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, target)  # atomic; FileExistsError on race
        finally:
            os.unlink(tmp)

    def read(self, target: str) -> str:
        with open(target) as fh:
            return fh.read()

    def list_names(self, directory: str) -> list[str]:
        return os.listdir(directory)

    def delete(self, target: str) -> None:
        os.remove(target)

    def age_seconds(self, target: str) -> float | None:
        import time as _time

        try:
            return _time.time() - os.path.getmtime(target)
        except OSError:
            return None


class InMemoryCommitProtocol(CommitProtocol):
    """Second, non-POSIX implementation of the contract — a conditional-
    PUT object store in memory (S3 ``If-None-Match: *`` semantics over a
    dict, strongly consistent LIST). Exists to prove the lake's
    transactionality rests ONLY on the CommitProtocol contract, not on
    POSIX details, and to let tests inject races deterministically:
    ``inject_before_put(store, target)`` runs inside the store lock
    right before the existence check — a hook can publish a competing
    name there and force the exact lost-update interleaving optimistic
    commits must survive. Share ONE instance across every handle of a
    table (the dict IS the store)."""

    def __init__(self, inject_before_put=None):
        import threading

        self._store: dict[str, bytes] = {}
        self._published_at: dict[str, float] = {}  # for age_seconds / GC grace
        self._lock = threading.RLock()  # RLock: hooks may publish
        self.inject_before_put = inject_before_put

    def publish(self, target: str, data: bytes) -> None:
        with self._lock:
            if self.inject_before_put is not None:
                hook, self.inject_before_put = self.inject_before_put, None
                hook(self, target)  # one-shot: re-arm explicitly if needed
            if target in self._store:
                raise FileExistsError(target)
            import time as _time

            self._store[target] = bytes(data)
            self._published_at[target] = _time.time()

    def read(self, target: str) -> str:
        with self._lock:  # consistent point-in-time GET
            try:
                return self._store[target].decode()
            except KeyError:
                raise FileNotFoundError(target) from None

    def list_names(self, directory: str) -> list[str]:
        prefix = directory.rstrip("/") + "/"
        # the lock makes LIST a consistent snapshot — iterating the
        # dict unlocked races publish() ("dict changed size during
        # iteration") in exactly the concurrent-writer scenarios this
        # class exists to test
        with self._lock:
            return [
                t[len(prefix):]
                for t in self._store
                if t.startswith(prefix) and "/" not in t[len(prefix):]
            ]

    def delete(self, target: str) -> None:
        with self._lock:
            if target not in self._store:
                raise FileNotFoundError(target)
            del self._store[target]
            self._published_at.pop(target, None)

    def age_seconds(self, target: str) -> float | None:
        import time as _time

        with self._lock:
            t = self._published_at.get(target)
        return None if t is None else _time.time() - t


class ConcurrentModification(RuntimeError):
    """Raised when a partition-replace commit discovers the partitions
    it computed from were modified by a concurrent commit — the caller
    must recompute from a fresh snapshot (Iceberg's validation-abort,
    never a silent rebase that would drop the concurrent files)."""


def _json_safe(v):
    """Stats values must round-trip through the JSON manifest; ISO
    strings keep timestamp ordering under plain string comparison."""
    import datetime as _dt

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _collect_file_stats(
    root: str, rel_paths: list[str], stat_cols: list[str]
) -> dict[str, dict[str, Any]]:
    """Per-file size + min/max for ``stat_cols``, read from parquet
    footers only (no data pages). Mirrors the reference's per-column
    stats collection on every write (radiant/tasks/iceberg/
    utils.py:196-243). Files whose footer lacks min/max for a column
    simply carry no entry for it — scans keep them (conservative)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    def one(rel: str) -> tuple[str, dict[str, Any]]:
        fp = os.path.join(root, rel)
        entry: dict[str, Any] = {"_bytes": os.path.getsize(fp)}
        if stat_cols:
            md = pq.ParquetFile(fp).metadata
            names = {md.schema.column(i).path: i for i in range(md.num_columns)}
            for c in stat_cols:
                i = names.get(c)
                if i is None:
                    continue
                mn = mx = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mn = st.min if mn is None or st.min < mn else mn
                    mx = st.max if mx is None or st.max > mx else mx
                if ok and mn is not None:
                    entry[c] = [_json_safe(mn), _json_safe(mx)]
        return rel, entry

    if not rel_paths:
        return {}
    # footer reads are IO-bound; a commit writes O(buckets) files, so
    # collect in parallel to keep driver-side commit latency flat in
    # the bucket count
    with ThreadPoolExecutor(max_workers=min(16, len(rel_paths))) as ex:
        return dict(ex.map(one, rel_paths))


def _file_may_match(stat_entry: dict[str, Any], skip: dict[str, tuple]) -> bool:
    """False only when the file's [min,max] for some column PROVABLY
    misses the requested [lo,hi] range (None bound = unbounded). Rows
    with NULL in the column never satisfy a range predicate, so
    dropping the file cannot lose matching rows."""
    for col, (lo, hi) in skip.items():
        rng = stat_entry.get(col)
        if not rng:
            continue
        mn, mx = rng
        if lo is not None and _json_safe(lo) > mx:
            return False
        if hi is not None and _json_safe(hi) < mn:
            return False
    return True


def _versions(path: str, protocol: "CommitProtocol | None" = None) -> list[int]:
    """Sorted snapshot version numbers present in the log."""
    log = os.path.join(path, _LOG_DIR)
    names = protocol.list_names(log) if protocol is not None else os.listdir(log)
    out = []
    for f in names:
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue  # stray non-version file
    return sorted(out)


class Snapshot:
    """A table version. Two serialized layouts:

    - **inline** (default): the version file carries the full
      ``{partition -> file list}`` and per-file stats. Simple, one
      read per snapshot; rewritten whole per commit — fine to ~10^5
      file entries.
    - **split** (``properties["manifest_split"] = true`` — Iceberg's
      manifest-list): the version file carries only
      ``refs: {partition -> content-hash}`` pointing at immutable
      per-partition manifest blobs under ``_log/manifests/``. A commit
      writes blobs ONLY for partitions it touched (unchanged
      partitions keep their hash — same content, same name, no write),
      so commit cost is O(touched), not O(table); a partition-pruned
      read loads only the requested partitions' blobs. ``files`` /
      ``stats`` materialize lazily (and fully) for consumers that want
      the whole map — the commit and pruned-read paths never do.
    """

    def __init__(
        self,
        version: int,
        schema: T.StructType,
        partition_col: str,
        files: dict[str, list[str]] | None = None,
        applied: dict[str, int] | None = None,
        properties: dict[str, Any] | None = None,
        stats: dict[str, dict[str, Any]] | None = None,
        refs: dict[str, str] | None = None,
        blob_loader=None,
    ):
        self.version = version
        self.schema = schema
        self.partition_col = partition_col
        self.applied = applied or {}
        self.properties = properties or {}
        self.refs = refs  # split mode iff not None
        self._blob_loader = blob_loader  # name -> {"files": [...], "stats": {...}}
        self._files = files
        self._stats = stats
        if refs is None:
            self._files = files or {}
            self._stats = stats or {}

    # --- lazy full materialization (split mode only pays when asked)

    def _materialize(self) -> None:
        if self._files is not None:
            return
        files: dict[str, list[str]] = {}
        stats: dict[str, dict[str, Any]] = {}
        for pv, name in (self.refs or {}).items():
            blob = self._blob_loader(name)
            files[pv] = list(blob["files"])
            stats.update(blob.get("stats", {}))
        self._files, self._stats = files, stats

    @property
    def files(self) -> dict[str, list[str]]:
        """partition value (as str) -> relative file paths."""
        self._materialize()
        return self._files

    @property
    def stats(self) -> dict[str, dict[str, Any]]:
        """per-file column statistics for scan-time file skipping
        (Iceberg's column metrics; reference collects them on every
        write, radiant/tasks/iceberg/utils.py:196-243):
        ``{rel_path: {"_bytes": int, col: [min, max], ...}}`` —
        min/max JSON-safe (timestamps as ISO strings); only columns in
        ``properties["stats_cols"]`` are collected."""
        self._materialize()
        return self._stats

    def part_entry(self, pv: str) -> tuple[list[str], dict[str, dict[str, Any]]]:
        """(files, stats) of ONE partition — in split mode this loads
        only that partition's blob."""
        if self.refs is not None and self._files is None:
            name = self.refs.get(pv)
            if name is None:
                return [], {}
            blob = self._blob_loader(name)
            return list(blob["files"]), dict(blob.get("stats", {}))
        return list(self.files.get(pv, [])), {
            f: self.stats[f] for f in self.files.get(pv, []) if f in self.stats
        }

    def partition_values(self) -> list[str]:
        return sorted(self.refs.keys() if self.refs is not None else self.files.keys())

    def to_json(self) -> str:
        d = {
            "version": self.version,
            "schema": self.schema.json(),
            "partition_col": self.partition_col,
            "applied": self.applied,
            "properties": self.properties,
        }
        if self.refs is not None:
            d["refs"] = self.refs
        else:
            d["files"] = self._files
            d["stats"] = self._stats
        return json.dumps(d)

    @staticmethod
    def from_json(raw: str, blob_loader=None) -> "Snapshot":
        d = json.loads(raw)
        return Snapshot(
            version=d["version"],
            schema=T.StructType.fromJson(json.loads(d["schema"])),
            partition_col=d["partition_col"],
            files=d.get("files"),
            applied=d.get("applied", {}),
            properties=d.get("properties", {}),
            stats=d.get("stats", {}),
            refs=d.get("refs"),
            blob_loader=blob_loader,
        )


def _version_path(root: str, version: int) -> str:
    return os.path.join(root, _LOG_DIR, f"v{version:012d}.json")


class LakeTable:
    """A named transactional table rooted at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        commit_protocol: CommitProtocol | None = None,
    ):
        self.spark = spark
        self.path = path
        self.commit_protocol = commit_protocol or PosixCommitProtocol()
        # partitions touched by this instance's most recent data commit
        self.last_commit_partitions: list[str] = []
        self._blob_cache: dict[str, dict] = {}  # manifest blobs are immutable

    # ------------------------------------------- split-manifest blobs

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.path, _LOG_DIR, "manifests", name)

    def _write_blob(self, content: dict) -> str:
        """Content-addressed immutable manifest blob: same content →
        same name → an untouched partition is never rewritten."""
        import hashlib

        data = json.dumps(content, sort_keys=True).encode()
        name = f"m-{hashlib.sha1(data).hexdigest()}.json"
        target = self._manifest_path(name)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        try:
            self.commit_protocol.publish(target, data)
        except FileExistsError:
            pass  # identical content already published
        self._blob_cache[name] = content
        return name

    def _load_blob(self, name: str) -> dict:
        blob = self._blob_cache.get(name)
        if blob is None:
            blob = json.loads(self.commit_protocol.read(self._manifest_path(name)))
            self._blob_cache[name] = blob
        return blob

    # ---------------------------------------------------------------- DDL

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_col: str,
        properties: dict[str, Any] | None = None,
        commit_protocol: "CommitProtocol | None" = None,
    ) -> "LakeTable":
        if partition_col not in schema.fieldNames():
            raise ValueError(f"partition column {partition_col!r} not in schema")
        os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        props = properties or {}
        snap = Snapshot(
            version=0,
            schema=schema,
            partition_col=partition_col,
            files=None if props.get("manifest_split") else {},
            refs={} if props.get("manifest_split") else None,
            properties=props,
        )
        tbl = LakeTable(spark, path, commit_protocol=commit_protocol)
        tbl._write_version(snap)
        return tbl

    @staticmethod
    def exists(path: str) -> bool:
        log = os.path.join(path, _LOG_DIR)
        return os.path.isdir(log) and bool(_versions(path))

    # ---------------------------------------------------------- snapshots

    def latest_version(self) -> int:
        versions = _versions(self.path, self.commit_protocol)
        if not versions:
            raise FileNotFoundError(f"no snapshots under {self.path}")
        return versions[-1]

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.latest_version() if version is None else version
        return Snapshot.from_json(
            self.commit_protocol.read(_version_path(self.path, v)),
            blob_loader=self._load_blob,
        )

    def _write_version(self, snap: Snapshot) -> None:
        """Atomically publish the version file through the commit
        protocol; raises FileExistsError on race. The POSIX protocol
        writes + fsyncs a temp file FIRST, then hard-links it to the
        final name — a concurrent reader can never observe a truncated
        manifest; an object-store protocol gets the same guarantee from
        conditional PUT (see CommitProtocol)."""
        self.commit_protocol.publish(
            _version_path(self.path, snap.version), snap.to_json().encode()
        )

    # ------------------------------------------------------------- reads

    def read(
        self,
        partitions: list[Any] | None = None,
        version: int | None = None,
        skip: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Scan live files (optionally pruned to specific partition values).

        The snapshot schema is passed explicitly so files written before
        an additive schema change surface NULL for the new columns.
        Partition pruning here is file-list pruning at plan time — the
        scan never opens files outside the requested partitions.

        ``skip={col: (lo, hi)}`` additionally prunes files whose
        manifest min/max for ``col`` cannot intersect [lo, hi] (either
        bound may be None). This is a PRUNING HINT: the caller still
        applies the real filter; skipping only removes files that
        provably contain no matching rows. At 100 TB this is the
        difference between opening 64 files and 64,000 for an
        lsn/ts-range read (reference: min/max scan pruning over Iceberg
        column metrics, SURVEY.md X8/X12)."""
        snap = self.snapshot(version)
        rel = self._select_files(snap, partitions, skip)
        if not rel:
            return self.spark.createDataFrame([], snap.schema)
        paths = [os.path.join(self.path, f) for f in rel]
        return self.spark.read.schema(snap.schema).parquet(*paths)

    def _select_files(
        self,
        snap: Snapshot,
        partitions: list[Any] | None,
        skip: dict[str, tuple] | None,
    ) -> list[str]:
        """File selection with partition pruning + stats skipping. In
        split-manifest layout a PRUNED selection loads only the
        requested partitions' manifest blobs — the whole point of the
        manifest-list at 10^6+ files."""
        if partitions is None:
            wanted = snap.partition_values()
        else:
            w = {str(p) for p in partitions}
            wanted = [pv for pv in snap.partition_values() if pv in w]
        rel: list[str] = []
        for pv in wanted:
            fs, st = snap.part_entry(pv)
            if skip:
                fs = [f for f in fs if _file_may_match(st.get(f, {}), skip)]
            rel.extend(fs)
        return rel

    def live_files(
        self,
        partitions: list[Any] | None = None,
        skip: dict[str, tuple] | None = None,
    ) -> list[str]:
        """The relative file list a read() with the same arguments would
        scan — lets tests and planners assert file-skipping directly."""
        return sorted(self._select_files(self.snapshot(), partitions, skip))

    def partitions(self) -> list[str]:
        return self.snapshot().partition_values()

    # ------------------------------------------------------------ writes

    def _write_data_files(
        self,
        df: DataFrame,
        pcol: str,
        layout_ready: bool = False,
        stat_cols: list[str] | None = None,
    ) -> tuple[dict[str, list[str]], dict[str, dict[str, Any]]]:
        """Write a commit's data files; return ({partition -> rel
        paths}, {rel path -> file stats}).

        Executors write in parallel via ``partitionBy`` on a duplicated
        layout column; the partition column itself stays as a regular
        data column inside every file (so explicit-schema scans work on
        arbitrary file lists, and parquet min/max stats still prune).

        Repartition on the layout column first: without it every task
        holds rows of every partition value and partitionBy fans out
        tasks x values tiny files. Callers whose plan is ALREADY
        hash-partitioned on the partition column (e.g. the merge
        engine, which repartitions before its LWW aggregation) pass
        ``layout_ready=True`` to skip the extra exchange.
        """
        commit_dir = f"commit-{uuid.uuid4().hex}"
        out = os.path.join(self.path, _DATA_DIR, commit_dir)
        from pyspark.sql import functions as F

        # NULL partition values would land under Hive's
        # __HIVE_DEFAULT_PARTITION__ sentinel and become untargetable by
        # partition reads/replaces — reject them inside the plan.
        layout = F.when(
            F.col(pcol).isNotNull(), F.col(pcol).cast("string")
        ).otherwise(
            F.raise_error(
                F.lit(f"NULL value in partition column {pcol!r}")
            ).cast("string")
        )
        laid = df.withColumn(_PB_COL, layout)
        if not layout_ready:
            laid = laid.repartition(F.col(_PB_COL))
        laid.write.partitionBy(_PB_COL).mode("overwrite").parquet(out)
        files: dict[str, list[str]] = {}
        if not os.path.isdir(out):
            return files, {}
        for entry in os.listdir(out):
            if not entry.startswith(f"{_PB_COL}="):
                continue
            pv = entry.split("=", 1)[1]
            pdir = os.path.join(out, entry)
            rels = [
                os.path.join(_DATA_DIR, commit_dir, entry, f)
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            ]
            if rels:
                files[pv] = sorted(rels)
        all_rels = [f for fs in files.values() for f in fs]
        stats = _collect_file_stats(self.path, all_rels, stat_cols or [])
        return files, stats

    def _commit(
        self,
        mutate,
        source_id: str | None = None,
        epoch: int | None = None,
    ) -> Snapshot | None:
        """Optimistic-concurrency commit loop.

        ``mutate(snapshot) -> {"schema": ..., "files": ..., "stats":
        ...}`` (inline layout) or ``{"schema": ..., "refs": ...}``
        (split layout) computes the next manifest from the freshest
        snapshot; on a version-file race we re-read and re-apply —
        partition-level changes rebase cleanly (reference:
        radiant/tasks/iceberg/utils.py:73-96 rebuilds the transaction
        against a fresh snapshot the same way).

        Returns the committed snapshot, or None when the epoch guard
        made the commit a no-op (already applied — exactly-once replay).
        """
        for attempt in range(MAX_COMMIT_RETRIES):
            snap = self.snapshot()
            if (
                source_id is not None
                and epoch is not None
                and snap.applied.get(source_id, -1) >= epoch
            ):
                return None
            nxt_parts = mutate(snap)
            # mutate may supply a full applied map (watermark adoption);
            # the (source_id, epoch) guard args layer on top of it
            applied = dict(nxt_parts.get("applied", snap.applied))
            if source_id is not None and epoch is not None:
                applied[source_id] = epoch
            nxt = Snapshot(
                version=snap.version + 1,
                schema=nxt_parts["schema"],
                partition_col=snap.partition_col,
                files=nxt_parts.get("files"),
                applied=applied,
                properties=snap.properties,
                stats=nxt_parts.get("stats"),
                refs=nxt_parts.get("refs"),
                blob_loader=self._load_blob,
            )
            try:
                self._write_version(nxt)
                return nxt
            except FileExistsError:
                time.sleep(min(2**attempt, 5) * 0.01 + random.random() * 0.01)
        raise CommitConflict(
            f"lost commit race {MAX_COMMIT_RETRIES} times at {self.path}"
        )

    _COERCIBLE = {
        # value-preserving casts (session TZ pinned UTC makes NTZ<->LTZ safe)
        (T.TimestampNTZType(), T.TimestampType()),
        (T.TimestampType(), T.TimestampNTZType()),
        (T.IntegerType(), T.LongType()),
        (T.FloatType(), T.DoubleType()),
    }

    def _evolved_schema(self, snap: Snapshot, df: DataFrame) -> T.StructType:
        """Additive-only schema evolution: unknown incoming columns are
        appended; existing columns keep the TABLE's type (incoming data
        is cast when the pair is safely coercible); other type changes
        and drops are rejected (SURVEY.md §1.2)."""
        current = {f.name: f for f in snap.schema.fields}
        out = list(snap.schema.fields)
        for f in df.schema.fields:
            if f.name == _PB_COL:
                continue
            if f.name in current:
                have = current[f.name].dataType
                if have != f.dataType and (f.dataType, have) not in self._COERCIBLE:
                    raise ValueError(
                        f"type change for {f.name}: {have} -> {f.dataType}"
                    )
            else:
                out.append(T.StructField(f.name, f.dataType, nullable=True))
        return T.StructType(out)

    def _conform(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project df onto the table schema (missing columns -> NULL;
        coercible existing columns cast to the table's type)."""
        from pyspark.sql import functions as F

        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in schema.fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif have[f.name] != f.dataType:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def append(
        self,
        df: DataFrame,
        source_id: str | None = None,
        epoch: int | None = None,
        layout_ready: bool = False,
    ) -> Snapshot | None:
        """Add files; existing partitions keep their files (fast path for
        immutable feeds). Schema evolves additively first."""
        snap0 = self.snapshot()
        if (
            source_id is not None
            and epoch is not None
            and snap0.applied.get(source_id, -1) >= epoch
        ):
            return None  # already applied: skip the (expensive) write too
        schema = self._evolved_schema(snap0, df)
        new_files, new_stats = self._write_data_files(
            self._conform(df, schema),
            snap0.partition_col,
            layout_ready=layout_ready,
            stat_cols=snap0.properties.get("stats_cols"),
        )

        if snap0.refs is not None:  # split layout: touch O(batch) blobs only

            def mutate(snap: Snapshot):
                from concurrent.futures import ThreadPoolExecutor

                def build(item):
                    pv, fs = item
                    old_files, old_stats = snap.part_entry(pv)
                    return pv, self._write_blob(
                        {
                            "files": old_files + fs,
                            "stats": {
                                **old_stats,
                                **{f: new_stats[f] for f in fs},
                            },
                        }
                    )

                refs = dict(snap.refs)
                # blob publishes fsync — thread them so the driver-side
                # commit latency stays flat in the bucket count
                with ThreadPoolExecutor(
                    max_workers=min(16, max(1, len(new_files)))
                ) as ex:
                    for pv, name in ex.map(build, new_files.items()):
                        refs[pv] = name
                return {"schema": self._evolved_schema(snap, df), "refs": refs}

        else:

            def mutate(snap: Snapshot):
                files = {k: list(v) for k, v in snap.files.items()}
                for pv, fs in new_files.items():
                    files.setdefault(pv, []).extend(fs)
                return {
                    "schema": self._evolved_schema(snap, df),
                    "files": files,
                    "stats": {**snap.stats, **new_stats},
                }

        out = self._commit(mutate, source_id=source_id, epoch=epoch)
        self.last_commit_partitions = sorted(new_files.keys())
        return out

    def overwrite_partitions(
        self,
        df: DataFrame,
        source_id: str | None = None,
        epoch: int | None = None,
        also_replace: list[Any] | None = None,
        layout_ready: bool = False,
        base_version: int | None = None,
    ) -> Snapshot | None:
        """Atomically replace exactly the partitions present in ``df``
        (plus ``also_replace`` values, which become empty if df has no
        rows for them). Untouched partitions keep their files — the
        reference's copy+swap without the copy.

        Conflict validation: if a concurrent commit modified any of the
        replaced partitions after ``base_version`` (the snapshot the
        replacement was COMPUTED from — pass it when the input df was
        read earlier; defaults to the current snapshot), the commit
        ABORTS with ConcurrentModification: the replacement lacks the
        concurrent files and silently rebasing would drop them.
        Disjoint-partition commits still rebase and land."""
        snap0 = self.snapshot(base_version)
        if (
            source_id is not None
            and epoch is not None
            and snap0.applied.get(source_id, -1) >= epoch
        ):
            return None
        schema = self._evolved_schema(snap0, df)
        new_files, new_stats = self._write_data_files(
            self._conform(df, schema),
            snap0.partition_col,
            layout_ready=layout_ready,
            stat_cols=snap0.properties.get("stats_cols"),
        )
        replaced = set(new_files.keys()) | {str(p) for p in (also_replace or [])}

        if snap0.refs is not None:  # split layout
            # blob names are content hashes, so ref equality IS file-list
            # equality — conflict validation never loads untouched blobs
            expected_refs = {p: snap0.refs.get(p) for p in replaced}

            def mutate(snap: Snapshot):
                for p in replaced:
                    if snap.refs.get(p) != expected_refs[p]:
                        raise ConcurrentModification(
                            f"partition {p!r} changed concurrently; recompute "
                            f"from a fresh snapshot before replacing it"
                        )
                from concurrent.futures import ThreadPoolExecutor

                def build(item):
                    pv, fs = item
                    return pv, self._write_blob(
                        {
                            "files": list(fs),
                            "stats": {f: new_stats[f] for f in fs},
                        }
                    )

                refs = {k: v for k, v in snap.refs.items() if k not in replaced}
                if new_files:
                    with ThreadPoolExecutor(
                        max_workers=min(16, len(new_files))
                    ) as ex:
                        for pv, name in ex.map(build, new_files.items()):
                            refs[pv] = name
                return {"schema": self._evolved_schema(snap, df), "refs": refs}

        else:
            expected = {p: list(snap0.files.get(p, [])) for p in replaced}

            def mutate(snap: Snapshot):
                for p in replaced:
                    if snap.files.get(p, []) != expected[p]:
                        raise ConcurrentModification(
                            f"partition {p!r} changed concurrently; recompute "
                            f"from a fresh snapshot before replacing it"
                        )
                files = {
                    k: list(v) for k, v in snap.files.items() if k not in replaced
                }
                dropped = {
                    f for p in replaced for f in snap.files.get(p, [])
                }
                for pv, fs in new_files.items():
                    files[pv] = list(fs)
                stats = {
                    k: v for k, v in snap.stats.items() if k not in dropped
                }
                stats.update(new_stats)
                return {
                    "schema": self._evolved_schema(snap, df),
                    "files": files,
                    "stats": stats,
                }

        out = self._commit(mutate, source_id=source_id, epoch=epoch)
        self.last_commit_partitions = sorted(replaced)
        return out

    def rewrite_files(
        self,
        df: DataFrame,
        replace: dict[str, list[str]],
        layout_ready: bool = False,
    ) -> Snapshot:
        """FILE-scoped rewrite (Iceberg's RewriteFiles): atomically swap
        exactly the named input files for ``df``'s new files, leaving
        every OTHER file in the touched partitions alive. This is the
        commit shape that lets compaction run CONCURRENTLY with an
        ingest stream: an append adds files it doesn't know about and
        rebases cleanly (the rewritten set and the appended set are
        disjoint), where ``overwrite_partitions`` must abort because a
        partition-level replace computed from a stale snapshot would
        drop the concurrent rows. Conflict rule: every file named in
        ``replace`` must still be live — another rewrite having taken
        any of them aborts with ConcurrentModification (two compactors
        folding the same input would duplicate its rows).

        ``replace`` maps partition value -> input files (as listed by
        the snapshot the fold was computed from). A partition whose
        fold produced no output (e.g. all rows tombstone-purged) simply
        loses its input files."""
        snap0 = self.snapshot()
        schema = self._evolved_schema(snap0, df)
        new_files, new_stats = self._write_data_files(
            self._conform(df, schema),
            snap0.partition_col,
            layout_ready=layout_ready,
            stat_cols=snap0.properties.get("stats_cols"),
        )
        # normalize BEFORE the unknown-partition check: _write_data_files
        # returns directory-string keys, and callers may pass raw (e.g.
        # int) partition values in `replace`
        replace = {str(p): list(fs) for p, fs in replace.items()}
        unknown = set(new_files) - set(replace)
        if unknown:
            raise ValueError(
                f"rewrite produced rows for partitions it did not read: "
                f"{sorted(unknown)}"
            )

        if snap0.refs is not None:  # split layout

            def mutate(snap: Snapshot):
                from concurrent.futures import ThreadPoolExecutor

                def build(item):
                    pv, taken = item
                    old_files, old_stats = snap.part_entry(pv)
                    missing = [f for f in taken if f not in old_files]
                    if missing:
                        raise ConcurrentModification(
                            f"files {missing[:3]} in partition {pv!r} were "
                            f"rewritten concurrently; recompute the fold"
                        )
                    taken_set = set(taken)
                    fs = [f for f in old_files if f not in taken_set]
                    fs += new_files.get(pv, [])
                    stats = {
                        f: old_stats[f] for f in fs if f in old_stats
                    }
                    stats.update(
                        {f: new_stats[f] for f in new_files.get(pv, [])}
                    )
                    return pv, self._write_blob({"files": fs, "stats": stats})

                refs = dict(snap.refs)
                with ThreadPoolExecutor(
                    max_workers=min(16, max(1, len(replace)))
                ) as ex:
                    for pv, name in ex.map(build, replace.items()):
                        refs[pv] = name
                return {"schema": self._evolved_schema(snap, df), "refs": refs}

        else:

            def mutate(snap: Snapshot):
                files = {k: list(v) for k, v in snap.files.items()}
                stats = dict(snap.stats)
                for pv, taken in replace.items():
                    cur = files.get(pv, [])
                    missing = [f for f in taken if f not in cur]
                    if missing:
                        raise ConcurrentModification(
                            f"files {missing[:3]} in partition {pv!r} were "
                            f"rewritten concurrently; recompute the fold"
                        )
                    taken_set = set(taken)
                    files[pv] = [f for f in cur if f not in taken_set]
                    files[pv] += new_files.get(pv, [])
                    for f in taken:
                        stats.pop(f, None)
                stats.update(new_stats)
                return {
                    "schema": self._evolved_schema(snap, df),
                    "files": files,
                    "stats": stats,
                }

        out = self._commit(mutate)
        assert out is not None
        # deliberately does NOT touch self.last_commit_partitions:
        # rewrite_files is designed to run CONCURRENTLY with an ingest
        # thread on the same handle (compact(concurrent_safe=True)),
        # and merge_batch reads last_commit_partitions right after its
        # append — a background rewrite overwriting it in that window
        # would misreport the batch's touched buckets to lineage and
        # incremental-aggregate refresh (round-5 review finding #4).
        # Callers get the touched set from their own `replace` arg.
        return out

    # ------------------------------------------------------- maintenance

    def add_columns(self, fields: list[T.StructField]) -> Snapshot:
        """ALTER TABLE ADD COLUMNS (additive only)."""

        def mutate(snap: Snapshot):
            names = set(snap.schema.fieldNames())
            out = list(snap.schema.fields)
            for f in fields:
                if f.name not in names:
                    out.append(T.StructField(f.name, f.dataType, nullable=True))
            if snap.refs is not None:
                return {"schema": T.StructType(out), "refs": snap.refs}
            return {
                "schema": T.StructType(out),
                "files": snap.files,
                "stats": snap.stats,
            }

        snap = self._commit(mutate)
        assert snap is not None
        return snap

    def carry_applied(self, applied: dict[str, int]) -> Snapshot:
        """Adopt per-source applied-epoch watermarks (table migration /
        rescale: the NEW table must refuse exactly the epochs the old
        one already applied, or a resumed stream double-applies).
        Runs through the standard _commit loop — mutate supplies the
        merged applied map."""

        def mutate(snap: Snapshot):
            merged = dict(snap.applied)
            for src, ep in applied.items():
                merged[src] = max(merged.get(src, -1), ep)
            out = {"schema": snap.schema, "applied": merged}
            if snap.refs is not None:
                out["refs"] = snap.refs
            else:
                out["files"] = snap.files
                out["stats"] = snap.stats
            return out

        snap = self._commit(mutate)
        assert snap is not None
        return snap

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Drop old version files (Iceberg's expire_snapshots): time
        travel is bounded to the newest ``keep_last`` versions; follow
        with ``vacuum()`` to reclaim the data files only those versions
        referenced. The latest version is never dropped."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        removed = 0
        for v in _versions(self.path, self.commit_protocol)[:-keep_last]:
            self.commit_protocol.delete(_version_path(self.path, v))
            removed += 1
        return removed

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Delete data files not referenced by ANY remaining snapshot
        (run expire_snapshots first to bound the live set), and remove
        whole dead commit directories — including their _SUCCESS /
        Hadoop .crc droppings, which would otherwise keep one directory
        tree alive per commit forever.
        Version files and manifest blobs go through the commit
        protocol; DATA files are deleted with local fs ops — they are
        written by Spark to the table path's (shared) filesystem
        regardless of which protocol holds the version log.

        ``grace_seconds`` (Iceberg orphan-file style): a concurrent
        committer publishes data files and manifest blobs BEFORE its
        version file, so anything unreferenced but younger than the
        grace window may belong to an in-flight commit and is KEPT —
        deleting it would let the commit land with dangling refs
        (silent data loss on every later read). Age comes from fs
        mtime (object stores expose Last-Modified the same way); an
        unstattable path is treated as young. Pass 0 only when writers
        are known quiesced. Returns the number of parquet data files
        removed."""
        now = time.time()

        def _young(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) < grace_seconds
            except OSError:
                return True  # can't stat -> assume in-flight, keep

        def _tree_young(root: str) -> bool:
            if _young(root):
                return True
            for dirpath, _d, fns in os.walk(root):
                if _young(dirpath) or any(
                    _young(os.path.join(dirpath, f)) for f in fns
                ):
                    return True
            return False

        snaps = [
            self.snapshot(v) for v in _versions(self.path, self.commit_protocol)
        ]
        live = {
            os.path.normpath(f)
            for s in snaps
            for fs in s.files.values()
            for f in fs
        }
        # GC manifest blobs not referenced by any remaining version
        live_blobs = {n for s in snaps if s.refs for n in s.refs.values()}
        mdir = os.path.join(self.path, _LOG_DIR, "manifests")
        try:
            blob_names = self.commit_protocol.list_names(mdir)
        except FileNotFoundError:
            blob_names = []
        def _blob_young(target: str) -> bool:
            # blobs are PROTOCOL-managed: their age must come through
            # the protocol (a local stat on an object-store deployment
            # would always fail and make every dead blob look
            # eternally in-flight — unbounded store growth)
            age = self.commit_protocol.age_seconds(target)
            return age is None or age < grace_seconds

        for fn in blob_names:
            if (
                fn.endswith(".json")
                and fn not in live_blobs
                and not _blob_young(os.path.join(mdir, fn))
            ):
                self.commit_protocol.delete(os.path.join(mdir, fn))
                self._blob_cache.pop(fn, None)
        live_commit_dirs = {os.path.normpath(f).split(os.sep)[1] for f in live}
        removed = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for entry in os.listdir(data_root):
            cdir = os.path.join(data_root, entry)
            if not os.path.isdir(cdir):
                continue
            if entry not in live_commit_dirs:
                if _tree_young(cdir):
                    continue  # possibly an in-flight commit's files
                # whole commit is dead: count its parquet files, drop the tree
                for dirpath, _d, filenames in os.walk(cdir):
                    removed += sum(1 for f in filenames if f.endswith(".parquet"))
                shutil.rmtree(cdir, ignore_errors=True)
                continue
            # commit partially live: remove only dead parquet files
            for dirpath, _d, filenames in os.walk(cdir, topdown=False):
                for fn in filenames:
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.path)
                    if (
                        fn.endswith(".parquet")
                        and os.path.normpath(rel) not in live
                        and not _young(os.path.join(dirpath, fn))
                    ):
                        os.remove(os.path.join(dirpath, fn))
                        removed += 1
        return removed
