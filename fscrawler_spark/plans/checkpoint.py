"""Checkpoint manifest: idempotent, resumable partition bookkeeping.

The analog of the reference's ``_checkpoint.json``
(/root/reference/beans/.../FsCrawlerCheckpoint.java:41-115 and
FsCrawlerCheckpointFileHandler.java:38-93), simplified by Spark's
execution model: instead of a BFS deque of pending paths with
double-count-skip logic (FsParser.java:868-887), we track completed
output *buckets*. Bucket writes are atomic (dynamic partition overwrite)
and deterministic, so a resumed run recomputes exactly the pending
buckets and the result is byte-identical — exactly-once by construction
(SURVEY §7 hard-parts).

The manifest is a plain JSON file next to the output table; on a real
cluster this would live in the table's metadata (Iceberg snapshot) or an
object-store marker — the logic is identical.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field


@dataclass
class CheckpointManifest:
    path: str
    scan_id: str = "run-0"
    completed: set[int] = field(default_factory=set)
    state: str = "RUNNING"  # RUNNING | COMPLETED (FsCrawlerCheckpoint state machine)
    files_processed: int = 0

    @classmethod
    def load_or_create(cls, path: str, scan_id: str = "run-0") -> "CheckpointManifest":
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            if "completed_buckets" in d and "completed" not in d:
                # legacy manifest migration — the _status.json -> _checkpoint.json
                # upgrade analog (FsCrawlerCheckpointFileHandler.java:95-120)
                d["completed"] = d.pop("completed_buckets")
                d.setdefault("state", "RUNNING")
            return cls(
                path=path,
                scan_id=d.get("scan_id", scan_id),
                completed=set(d.get("completed", [])),
                state=d.get("state", "RUNNING"),
                files_processed=d.get("files_processed", 0),
            )
        return cls(path=path, scan_id=scan_id)

    def pending(self, num_buckets: int) -> list[int]:
        return [b for b in range(num_buckets) if b not in self.completed]

    def mark_completed(self, buckets: list[int], rows: int = 0) -> None:
        self.completed.update(buckets)
        self.files_processed += rows
        self.save()

    def finish(self) -> None:
        self.state = "COMPLETED"
        self.save()

    def save(self) -> None:
        """Atomic write (tmp + rename), same crash-safety contract as
        FsCrawlerCheckpointFileHandler.java:45-93."""
        d = {
            "scan_id": self.scan_id,
            "completed": sorted(self.completed),
            "state": self.state,
            "files_processed": self.files_processed,
        }
        dir_ = os.path.dirname(self.path) or "."
        os.makedirs(dir_, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=dir_, prefix=".ckpt-")
        with os.fdopen(fd, "w") as f:
            json.dump(d, f)
        os.replace(tmp, self.path)
