"""Snapshot-commit table catalog: atomic, idempotent, time-travelable.

Gives the job the commit discipline the reference gets from
commit-after-process Kafka offsets (kafka_background_service.py:130-158,
``enable_auto_commit=False`` settings.py:122) and that production Spark gets
from Iceberg atomic snapshot commits:

- output becomes visible ONLY when the manifest gains a snapshot entry
  (written via tmp-file + ``os.replace`` — atomic on POSIX);
- a failed/killed job leaves data files but no manifest entry => invisible
  => the rerun re-reads the same input (exactly-once VISIBLE effect);
- committing the same ``run_id`` twice is a no-op (idempotent resume);
- ``VERSION AS OF`` analog via ``read(..., as_of=snapshot_id)`` (reference
  replay/seek analog: lib/kafka/kafka.py:195-251).

In production this class is replaced 1:1 by Iceberg
(``df.writeTo(tbl).append()`` + incremental reads); the sandbox has no
Iceberg runtime jars, so the same contract is implemented on plain parquet
directories. Single-writer per table is assumed (Iceberg's optimistic
catalog swap handles multi-writer).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    run_id: str
    committed_at: float
    n_files: int


class SnapshotTable:
    def __init__(self, warehouse: str, name: str):
        self.root = Path(warehouse) / name
        self.data_dir = self.root / "data"
        self.manifest_path = self.root / "_snapshots.json"
        self.data_dir.mkdir(parents=True, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def snapshots(self) -> list[Snapshot]:
        if not self.manifest_path.exists():
            return []
        with self.manifest_path.open(encoding="utf-8") as fh:
            return [Snapshot(**e) for e in json.load(fh)]

    def _write_manifest(self, entries: list[Snapshot]) -> None:
        tmp = self.root / f"_snapshots.{uuid.uuid4().hex}.tmp"
        tmp.write_text(
            json.dumps([vars(e) for e in entries], indent=1), encoding="utf-8"
        )
        os.replace(tmp, self.manifest_path)  # atomic visibility flip

    def committed_run_ids(self) -> set[str]:
        return {s.run_id for s in self.snapshots()}

    # -- write ------------------------------------------------------------
    def commit(self, df: "DataFrame", run_id: str) -> Snapshot | None:
        """Write df as a new snapshot; no-op if run_id already committed."""
        entries = self.snapshots()
        if any(e.run_id == run_id for e in entries):
            return None  # idempotent: rerun of a committed run
        snapshot_id = (entries[-1].snapshot_id + 1) if entries else 1
        out_dir = self.data_dir / f"snap-{snapshot_id:06d}-{run_id}"
        # overwrite, NOT errorifexists: a commit that died mid-write leaves
        # an orphan data dir with no manifest entry (invisible). The retry/
        # replay must be able to reclaim that path — erroring on it would
        # turn every replay into a permanent PATH_ALREADY_EXISTS crash loop.
        # Visibility still flips only at the atomic manifest replace below.
        df.write.mode("overwrite").parquet(str(out_dir))
        n_files = len(list(out_dir.glob("*.parquet")))
        snap = Snapshot(
            snapshot_id=snapshot_id,
            run_id=run_id,
            committed_at=time.time(),
            n_files=n_files,
        )
        self._write_manifest(entries + [snap])
        return snap

    def _snap_path(self, s: Snapshot) -> str:
        return str(self.data_dir / f"snap-{s.snapshot_id:06d}-{s.run_id}")

    # -- read -------------------------------------------------------------
    def read(
        self, spark: "SparkSession", as_of: int | None = None
    ) -> "DataFrame | None":
        """Union of all committed snapshots (optionally up to ``as_of``).
        Returns None for an empty table."""
        snaps = self.snapshots()
        if as_of is not None:
            snaps = [s for s in snaps if s.snapshot_id <= as_of]
        if not snaps:
            return None
        return spark.read.parquet(*[self._snap_path(s) for s in snaps])

    def read_snapshot(self, spark: "SparkSession", snapshot_id: int) -> "DataFrame":
        """Read exactly one snapshot's files (the incremental-read analog)."""
        for s in self.snapshots():
            if s.snapshot_id == snapshot_id:
                return spark.read.parquet(self._snap_path(s))
        raise KeyError(f"snapshot {snapshot_id} not found")

    def read_since(
        self, spark: "SparkSession", after_snapshot_id: int
    ) -> "DataFrame | None":
        """Incremental read: union of snapshots committed AFTER the given
        id (Iceberg incremental-scan analog; replaces the reference's
        consume-from-committed-offset, kafka_background_service.py:60-92).
        A downstream consumer persists the last snapshot id it processed
        and calls this to get exactly the delta."""
        snaps = [
            s for s in self.snapshots() if s.snapshot_id > after_snapshot_id
        ]
        if not snaps:
            return None
        return spark.read.parquet(*[self._snap_path(s) for s in snaps])

    def current_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1].snapshot_id if snaps else 0
