"""Iceberg-style snapshot log over Parquet: atomic commits + resume.

The sandbox ships no Iceberg/Delta jars, so commit semantics are realized
the way Iceberg itself does it — an append-only JSON manifest log next to
the data files; readers only see files named by a committed manifest.
This provides the north_rule's checkpoint/resume: a failed run leaves
orphan parquet files that no manifest references, and a restart
anti-joins the committed urls (the Spark translation of the reference's
``skip_existing`` resume, extract.py:93-104).

Layout:
    <table>/data/part-*.parquet       (written by Spark)
    <table>/_snapshots/v{N}.json      {"snapshot_id", "files", "row_count",
                                       "parent", "committed_at_ms"}
    <table>/_snapshots/LATEST         text file holding N (atomic rename)
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    snapshot_id: int
    files: list[str]
    row_count: int
    parent: int | None


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.log_dir = os.path.join(path, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log ----------------------------------------------------------
    def _latest_version(self) -> int:
        latest = os.path.join(self.log_dir, "LATEST")
        if not os.path.exists(latest):
            return 0
        with open(latest) as f:
            return int(f.read().strip() or 0)

    def current_snapshot(self) -> Snapshot | None:
        version = self._latest_version()
        if version == 0:
            return None
        with open(os.path.join(self.log_dir, f"v{version}.json")) as f:
            manifest = json.load(f)
        return Snapshot(
            snapshot_id=manifest["snapshot_id"],
            files=manifest["files"],
            row_count=manifest["row_count"],
            parent=manifest.get("parent"),
        )

    def committed_files(self) -> list[str]:
        snapshot = self.current_snapshot()
        return snapshot.files if snapshot else []

    # -- write path ----------------------------------------------------
    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        staging = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(staging)
        new_files = [
            os.path.join(staging, name)
            for name in sorted(os.listdir(staging))
            if name.endswith(".parquet")
        ]
        spark = df.sparkSession
        new_rows = spark.read.parquet(*new_files).count() if new_files else 0
        return new_files, new_rows

    def append(self, df: DataFrame) -> Snapshot:
        """Write df as new parquet files, then commit a manifest that
        references old + new files.  Crash before the LATEST rename means
        the new files are invisible (atomic commit)."""
        new_files, new_rows = self._write_files(df)
        parent = self.current_snapshot()
        version = self._latest_version() + 1
        snapshot = Snapshot(
            snapshot_id=version,
            files=(parent.files if parent else []) + new_files,
            row_count=(parent.row_count if parent else 0) + new_rows,
            parent=parent.snapshot_id if parent else None,
        )
        return self._commit(snapshot)

    def overwrite(self, df: DataFrame) -> Snapshot:
        """Write df as new files and commit a manifest referencing ONLY
        them — Iceberg's replace/overwrite snapshot.  Prior versions
        stay readable via time travel (their files are never deleted
        here; expiry is a separate maintenance concern)."""
        new_files, new_rows = self._write_files(df)
        parent = self.current_snapshot()
        version = self._latest_version() + 1
        snapshot = Snapshot(
            snapshot_id=version,
            files=new_files,
            row_count=new_rows,
            parent=parent.snapshot_id if parent else None,
        )
        return self._commit(snapshot)

    def _commit(self, snapshot: Snapshot) -> Snapshot:
        version = snapshot.snapshot_id
        manifest_path = os.path.join(self.log_dir, f"v{version}.json")
        with open(manifest_path, "w") as f:
            json.dump(
                {
                    "snapshot_id": snapshot.snapshot_id,
                    "files": snapshot.files,
                    "row_count": snapshot.row_count,
                    "parent": snapshot.parent,
                },
                f,
            )
        # Atomic pointer flip.
        fd, tmp = tempfile.mkstemp(dir=self.log_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(self.log_dir, "LATEST"))
        return snapshot

    def write_uncommitted(self, df: DataFrame) -> str:
        """Simulates a crash mid-write: data lands, no manifest commit."""
        staging = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(staging)
        return staging

    # -- read path -----------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None
             ) -> DataFrame | None:
        """Read a committed snapshot (time travel via snapshot_id)."""
        if snapshot_id is None:
            snapshot = self.current_snapshot()
        else:
            with open(os.path.join(self.log_dir, f"v{snapshot_id}.json")) as f:
                manifest = json.load(f)
            snapshot = Snapshot(
                manifest["snapshot_id"], manifest["files"],
                manifest["row_count"], manifest.get("parent"),
            )
        if snapshot is None or not snapshot.files:
            return None
        return spark.read.parquet(*snapshot.files)


def remaining_pages(pages: DataFrame, answers_table: SnapshotTable,
                    model: str | None = None) -> DataFrame:
    """Resume: drop pages whose url is already in the committed answers
    snapshot (left-anti join — reference R3, extract.py:93-104)."""
    done = answers_table.read(pages.sparkSession)
    if done is None:
        return pages
    if model is not None:
        done = done.filter(F.col("model") == model)
    return pages.join(done.select("url"), "url", "left_anti")
