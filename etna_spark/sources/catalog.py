"""Snapshot-versioned table catalog: Iceberg when available, parquet fallback.

The north rule requires jobs resumable from Iceberg-snapshot checkpoints. In
this sandbox no Iceberg runtime jar is present, so the catalog abstracts the
SNAPSHOT CONTRACT the engine needs and implements it over plain parquet:

- a table is a directory of immutable data files plus ``_snapshots.json``;
- every append creates snapshot k+1 listing the files it added;
- ``read(table, snapshot_id)`` sees exactly the files of snapshots ≤ id;
- ``read_delta(table, after_id, until_id)`` sees only files appended in
  (after_id, until_id] — the incremental-refresh input;
- ``overwrite_partitions`` atomically replaces the files of a partition
  subset (the tier-refresh MERGE target).

With Iceberg the same calls map to ``table.snapshot_id``, incremental scan
(``start-snapshot-id``/``end-snapshot-id``) and ``overwritePartitions()``;
swap the impl, keep the engine. (SURVEY.md §7.5 'Iceberg availability'.)

Writes are atomic via write-temp-then-rename + a json swap, so a job killed
mid-write never corrupts the table — the basis of the resume tests.

Known divergence from Iceberg: ``overwrite_partitions`` retires replaced
files from HISTORICAL snapshot entries too (the fallback keeps one file list
per snapshot, not full manifests), so time-travel reads to pre-overwrite
snapshots of tier tables are not supported — only the current view and the
append-delta scan, which is all the engine uses. Input tables are
append-only, so their full snapshot history stays readable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    id: int
    files: list[str]  # paths relative to table root, added by this snapshot
    wall_time: float
    # snapshot summary properties (Iceberg: snapshot.summary) — the tier
    # engine stores its input watermark here so data commit + checkpoint
    # advance are ONE atomic operation (no crash window can double-apply a
    # delta)
    properties: dict | None = None


class ParquetSnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- snapshot log ---------------------------------------------------------

    @property
    def _log_path(self) -> str:
        return os.path.join(self.root, "_snapshots.json")

    def snapshots(self) -> list[Snapshot]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return [Snapshot(**s) for s in json.load(f)]

    def current_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1].id if snaps else 0

    def _write_log(self, snaps: list[Snapshot]) -> None:
        tmp = self._log_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump([s.__dict__ for s in snaps], f, indent=1)
        os.replace(tmp, self._log_path)  # atomic commit point

    # -- io -------------------------------------------------------------------

    def _files_upto(self, snapshot_id: int | None) -> list[str]:
        out = []
        for s in self.snapshots():
            if snapshot_id is None or s.id <= snapshot_id:
                out.extend(s.files)
        return out

    def _stage_df(self, df: DataFrame) -> list[str]:
        """Write df into an immutable staging dir, return relative file paths."""
        stage = f"data-{uuid.uuid4().hex}"
        out_dir = os.path.join(self.root, stage)
        df.write.mode("overwrite").parquet(out_dir)
        return [
            os.path.join(stage, f)
            for f in sorted(os.listdir(out_dir))
            if f.endswith(".parquet")
        ]

    def append(self, df: DataFrame, properties: dict | None = None) -> int:
        """Append rows as a new snapshot; returns its id."""
        files = self._stage_df(df)
        snaps = self.snapshots()
        new_id = (snaps[-1].id if snaps else 0) + 1
        snaps.append(
            Snapshot(id=new_id, files=files, wall_time=time.time(),
                     properties=properties)
        )
        self._write_log(snaps)
        return new_id

    def latest_property(self, key: str, default=None):
        """Highest-snapshot value of a snapshot property (watermark reads)."""
        for s in reversed(self.snapshots()):
            if s.properties and key in s.properties:
                return s.properties[key]
        return default

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        files = self._files_upto(snapshot_id)
        if not files:
            raise ValueError(f"table {self.root} is empty")
        return spark.read.parquet(*[os.path.join(self.root, f) for f in files])

    def read_delta(
        self, spark: SparkSession, after_id: int, until_id: int
    ) -> DataFrame | None:
        """Rows appended in snapshots (after_id, until_id] — the incremental
        scan."""
        files = []
        for s in self.snapshots():
            if after_id < s.id <= until_id:
                files.extend(s.files)
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(self.root, f) for f in files])

    # -- partition-scoped overwrite (tier tables) ------------------------------

    def overwrite_partitions(
        self, df: DataFrame, partition_col: str, partition_values: list,
        properties: dict | None = None,
    ) -> int:
        """Replace all rows of the named partitions with ``df`` (which must
        contain only those partitions). Files of other partitions are kept.
        Maps to Iceberg ``overwritePartitions()``.

        Each partition value is staged as its own file group, so the
        file→partition mapping is exact — retention and later overwrites
        retire whole files, never rewrite them. (A refresh only touches the
        partitions its delta covers, so the per-partition write fan-out is
        small by construction.)"""
        df = df.cache()
        try:
            files: list[str] = []
            file_parts: dict[str, str] = {}
            for v in partition_values:
                part_files = self._stage_df(df.filter(F.col(partition_col) == F.lit(v)))
                files.extend(part_files)
                for f in part_files:
                    file_parts[f] = str(v)
        finally:
            df.unpersist()
        snaps = self.snapshots()
        part_map = self._partition_map()
        wanted = set(map(str, partition_values))
        retired = {f for f, parts in part_map.items() if parts & wanted}
        kept_snaps = [
            # keep historical properties: latest_property() walks the whole
            # log, so dropping them here would erase the tier watermark that
            # _refresh_tier reads (double-apply hazard after retention)
            Snapshot(id=s.id, files=[f for f in s.files if f not in retired],
                     wall_time=s.wall_time, properties=s.properties)
            for s in snaps
        ]
        new_id = (snaps[-1].id if snaps else 0) + 1
        kept_snaps.append(
            Snapshot(id=new_id, files=files, wall_time=time.time(),
                     properties=properties)
        )
        # partition sidecar first, snapshot log last: the log write is the
        # atomic commit point, and the sidecar only matters for files the log
        # references
        self._set_partition_map_entries(file_parts)
        self._write_log(kept_snaps)
        return new_id

    # partition sidecar: file -> set of partition values it contains
    @property
    def _part_map_path(self) -> str:
        return os.path.join(self.root, "_partitions.json")

    def _partition_map(self) -> dict[str, set]:
        if not os.path.exists(self._part_map_path):
            return {}
        with open(self._part_map_path) as f:
            return {k: set(v) for k, v in json.load(f).items()}

    def _set_partition_map_entries(self, file_parts: dict[str, str]) -> None:
        m = self._partition_map()
        live = set()
        for s in self.snapshots():
            live.update(s.files)
        m = {k: v for k, v in m.items() if k in live}
        for f, v in file_parts.items():
            m[f] = {v}
        tmp = self._part_map_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({k: sorted(v) for k, v in m.items()}, fh, indent=1)
        os.replace(tmp, self._part_map_path)

    def drop_partitions(self, partition_values: list) -> int:
        """Retention: drop whole partitions (expire old tier windows)."""
        vals = set(map(str, partition_values))
        part_map = self._partition_map()
        retired = {f for f, parts in part_map.items() if parts and parts <= vals}
        snaps = self.snapshots()
        kept = [
            Snapshot(id=s.id, files=[f for f in s.files if f not in retired],
                     wall_time=s.wall_time, properties=s.properties)
            for s in snaps
        ]
        new_id = (snaps[-1].id if snaps else 0) + 1
        # carry the current watermark forward on the retention snapshot too,
        # so even a log rewrite that trims history keeps the watermark visible
        props = {}
        for s in reversed(snaps):
            if s.properties:
                props = dict(s.properties)
                break
        kept.append(Snapshot(id=new_id, files=[], wall_time=time.time(),
                             properties=props or None))
        self._write_log(kept)
        return new_id

    def compact_files(self) -> None:
        """Physically delete files no longer referenced by any snapshot
        (expire_snapshots equivalent)."""
        live = set()
        for s in self.snapshots():
            live.update(s.files)
        for d in os.listdir(self.root):
            p = os.path.join(self.root, d)
            if d.startswith("data-") and os.path.isdir(p):
                for f in os.listdir(p):
                    rel = os.path.join(d, f)
                    if f.endswith(".parquet") and rel not in live:
                        os.remove(os.path.join(self.root, rel))
                if not os.listdir(p):
                    shutil.rmtree(p)
