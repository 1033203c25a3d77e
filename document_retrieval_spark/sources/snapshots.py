"""Minimal Iceberg-style snapshot layer over parquet.

The target deployment reads transcripts from an Iceberg table
(BASELINE.json input_hint); this environment has no Iceberg jars, so this
module implements the three Iceberg properties the engine actually relies
on, with the same mechanics Iceberg itself uses:

- **atomic append commits**: data files are immutable; a commit writes new
  files plus a snapshot manifest listing the table's complete file set, then
  atomically swaps the current-version pointer (`os.replace`);
- **snapshot isolation**: readers resolve the pointer once and scan the
  explicit file list of that snapshot — concurrent commits never change what
  an in-flight job reads;
- **time travel**: any historical snapshot id can be read back; snapshots
  record parent lineage and row-count summaries (Iceberg's summary map).

This is a single-writer design (commits serialize on the pointer swap; a
concurrent second writer loses with a clear error), which matches the
engine's ingestion model: one streaming stager / one compaction job.

Layout:
    table/
      data/<uuid>-<n>.parquet    immutable data files
      snapshots/snap-<id>.json   {"id", "parent", "files", "summary", ...}
      VERSION                    text file: current snapshot id (atomic swap)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Versioned parquet table with atomic appends and time travel."""

    def __init__(self, spark: SparkSession, path: str,
                 orphan_grace_s: float = 300.0):
        self.spark = spark
        self.path = path.rstrip("/")
        self.orphan_grace_s = orphan_grace_s
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "snapshots"), exist_ok=True)

    # ---------- metadata ----------

    def current_snapshot_id(self) -> int | None:
        p = os.path.join(self.path, "VERSION")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int) -> dict:
        p = os.path.join(self.path, "snapshots", f"snap-{snapshot_id}.json")
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        sid = self.current_snapshot_id()
        while sid is not None:
            s = self.snapshot(sid)
            out.append(s)
            sid = s["parent"]
        return list(reversed(out))

    # ---------- write ----------

    def commit_append(self, df: DataFrame) -> int:
        """Append df as a new snapshot; returns the new snapshot id.
        The commit is atomic: readers see the old or the new snapshot,
        never a partial file set."""
        parent = self.current_snapshot_id()
        base_files = self.snapshot(parent)["files"] if parent is not None else []

        # write to a scratch dir, then move the immutable parts into data/
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        new_files, rows = [], 0
        commit_uuid = uuid.uuid4().hex[:12]
        for i, name in enumerate(sorted(os.listdir(tmp))):
            if not name.endswith(".parquet"):
                continue
            dst = f"data/{commit_uuid}-{i:05d}.parquet"
            shutil.move(os.path.join(tmp, name), os.path.join(self.path, dst))
            new_files.append(dst)
        shutil.rmtree(tmp, ignore_errors=True)

        new_id = (parent or 0) + 1
        snap = {
            "id": new_id,
            "parent": parent,
            "ts": time.time(),
            "files": base_files + new_files,
            "summary": {
                "added_files": len(new_files),
                "total_files": len(base_files) + len(new_files),
            },
        }
        snap_path = os.path.join(self.path, "snapshots", f"snap-{new_id}.json")
        # Crash recovery: a crash between the snapshot-file create below and
        # the VERSION swap (the commit point) leaves an orphan
        # snap-<new_id>.json. Its id is greater than the committed VERSION,
        # so no reader resolves it and no committed snapshot lists its files
        # — under this table's single-writer contract it is reclaimable.
        # Without this, every later commit recomputes the same new_id from
        # the un-swapped VERSION and collides forever.
        #
        # The reclaim is gated on the orphan's age (orphan_grace_s): an
        # orphan younger than the grace window could be a live committer
        # mid-commit-window (out-of-contract concurrent writer), and
        # deleting its file would silently drop its commit instead of
        # letting it lose with an error at the O_EXCL create. Age is the
        # disambiguator a lock-free single-pointer design has: a crashed
        # writer's orphan only ever grows older, a live writer swaps VERSION
        # within milliseconds of the create.
        cur = self.current_snapshot_id()
        if os.path.exists(snap_path) and (cur is None or new_id > cur):
            age = time.time() - os.path.getmtime(snap_path)
            if age < self.orphan_grace_s:
                raise RuntimeError(
                    f"snapshot {new_id} exists but is not committed and is "
                    f"only {age:.1f}s old — either a concurrent writer is "
                    f"mid-commit (unsupported: single-writer table) or a "
                    f"writer crashed moments ago; retry after "
                    f"{self.orphan_grace_s}s for automatic orphan reclaim"
                )
            # Reclaim by renaming ASIDE, never unlinking: an out-of-contract
            # concurrent writer that passed the same checks may have created
            # AND committed snap_path between our age check and this point
            # (VERSION swaps only ms after its O_EXCL create). A committed
            # snapshot file must never be deleted, so (1) move the file
            # aside, (2) re-read VERSION: if it reached new_id the orphan
            # was actually committed — restore it and lose cleanly. The
            # aside file is kept as a tombstone (readers never list it:
            # snapshots resolve by exact snap-<id>.json name), so even the
            # residual commit-after-recheck window fails loudly
            # (FileNotFoundError in read()) and is hand-recoverable, rather
            # than silently serving a table whose snapshot file is gone.
            aside = snap_path + f".orphan-{uuid.uuid4().hex[:8]}"
            try:
                os.replace(snap_path, aside)
            except FileNotFoundError:
                pass  # a concurrent reclaimer won; O_EXCL below arbitrates
            else:
                if self.current_snapshot_id() == new_id:
                    os.replace(aside, snap_path)
                    raise RuntimeError(
                        f"snapshot {new_id} was committed by a concurrent "
                        "writer during orphan reclaim (unsupported: "
                        "single-writer table)"
                    )
        try:
            # O_EXCL create — the atomic loser-gets-an-error check (a plain
            # exists() test would be a TOCTOU race between two committers)
            with open(snap_path, "x") as f:
                json.dump(snap, f, indent=1)
        except FileExistsError:
            raise RuntimeError(
                f"snapshot {new_id} already committed (concurrent writer)"
            ) from None
        # atomic pointer swap — THE commit point
        vtmp = os.path.join(self.path, f"_VERSION.{commit_uuid}")
        with open(vtmp, "w") as f:
            f.write(str(new_id))
        os.replace(vtmp, os.path.join(self.path, "VERSION"))
        return new_id

    # ---------- read ----------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Scan the table at a snapshot (default: current). The explicit
        per-snapshot file list IS the isolation: later commits add files this
        reader never lists."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise ValueError(f"{self.path}: no snapshot committed yet")
        files = [os.path.join(self.path, f) for f in self.snapshot(sid)["files"]]
        if not files:
            raise ValueError(f"snapshot {sid} lists no files")
        return self.spark.read.parquet(*files)


def is_snapshot_table(path: str) -> bool:
    return os.path.exists(os.path.join(path, "VERSION")) and os.path.isdir(
        os.path.join(path, "snapshots")
    )
