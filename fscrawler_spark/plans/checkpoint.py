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

Beyond bucket ids the manifest persists:

* ``num_buckets`` + ``settings_fingerprint`` — the settings the completed
  buckets were computed with. Resuming with different settings would
  silently mix incompatible runs (changed num_buckets shifts every
  salted_bucket assignment; changed filters change row content), so a
  mismatch REFUSES to resume instead.
* ``retry_count`` / ``last_error`` — wave-failure bookkeeping, the
  FsCrawlerCheckpoint.java:41-115 retryCount/lastError analog, driving
  the bounded driver re-drive loop in plans/pipeline.py.
* ``state`` RUNNING | PAUSED | COMPLETED — the FsParser state machine
  (FsParser.java:186-307); a PAUSE is requested out-of-band via a marker
  file (the REST /_crawler/pause analog, rest/.../CrawlerApi.java:55-151)
  and honored between waves.

The manifest is a plain JSON file next to the output table; on a real
cluster this would live in the table's metadata (Iceberg snapshot) or an
object-store marker — the logic is identical.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field


def migrate_manifest_dict(d: dict) -> dict:
    """Legacy on-disk manifest migrations, shared by the loader and the
    doctor (plans/doctor.py) so their views can never drift — the
    _status.json -> _checkpoint.json upgrade analog
    (FsCrawlerCheckpointFileHandler.java:95-120)."""
    if "completed_buckets" in d and "completed" not in d:
        d["completed"] = d.pop("completed_buckets")
        d.setdefault("state", "RUNNING")
    # legacy bare-int diff base: carries no table identity — the exact
    # ambiguity the {root, snapshot_id} form closes (snapshot ids are
    # table-local) — so it is discarded; one full diff re-records
    if not isinstance(d.get("input_snapshot"), (dict, type(None))):
        d["input_snapshot"] = None
    return d


class _NoExternalEdit(Exception):
    """Internal control flow: the manifest on disk is our own last write."""


class SettingsMismatchError(ValueError):
    """Resume attempted with settings incompatible with the manifest."""


@dataclass
class CheckpointManifest:
    path: str
    scan_id: str = "run-0"
    completed: set[int] = field(default_factory=set)
    state: str = "RUNNING"  # RUNNING | PAUSED | COMPLETED
    files_processed: int = 0
    num_buckets: int | None = None
    settings_fingerprint: str | None = None
    retry_count: int = 0
    last_error: str | None = None
    # epoch seconds of the next scheduled scan (FsCrawlerCheckpoint
    # nextCheck, FsParser.java:431-452): the CLI loop re-reads the FILE
    # while sleeping and wakes early when this passes — so an external
    # actor (REST, another process editing the manifest) can pull the
    # next run forward, like the reference's shouldWakeFromCheckpoint
    # (FsParser.java:1401-1417)
    next_check: float | None = None
    # diff layout the incremental tick runs with ('parquet' | 'bucketed').
    # Recorded the first time a real tick resolves a layout so later ticks
    # called WITHOUT an explicit layout default to the table's own — the
    # scale-correct bucketed diff must not hide behind a flag the operator
    # has to remember (round-5 close of the r4 "opt-in layout" finding).
    tick_layout: str | None = None
    # the ``snap:`` input table (and snapshot id) this output is known to
    # equal the extraction of — the basis of the tick's O(changed-files)
    # manifest-diff delta (plans/pipeline.run_incremental_update):
    # {"root": str, "snapshot_id": int}. The root is part of the record
    # because snapshot ids are only unique WITHIN a table (they always
    # start at 1): a bare id would let a tick pointed at a different
    # snap: root — or the same root after a drop-and-recreate — diff the
    # wrong table's manifests and silently corrupt the output. None
    # whenever the correspondence can't be proven (non-snapshot inputs,
    # resumed/partial full runs): the tick then full-diffs and re-records.
    input_snapshot: dict | None = None
    # where (and as which snapshot id) this output was last PUBLISHED to
    # a snapshot table: {"root": str, "snapshot_id": int}. The delta-
    # publish precondition — a tick may apply_delta onto the table ONLY
    # while table.current_id() still equals the recorded id AND the
    # output has not mutated unpublished since (any mutating tick that
    # skips publishing clears this). None ⇒ the next publish bootstraps
    # a full overwrite.
    published: dict | None = None
    # True while an explicit set_next_check is pending its save — save()
    # then skips the on-disk pull-forward merge (the overwrite path)
    _next_check_dirty: bool = field(default=False, repr=False, compare=False)
    # mtime_ns of OUR last write: when the file is untouched since, the
    # pull-forward merge read is skipped (no external edit to merge)
    _saved_mtime_ns: int | None = field(default=None, repr=False, compare=False)

    @classmethod
    def load_or_create(
        cls,
        path: str,
        scan_id: str = "run-0",
        num_buckets: int | None = None,
        settings_fingerprint: str | None = None,
    ) -> "CheckpointManifest":
        if os.path.exists(path):
            try:
                with open(path) as f:
                    d = json.load(f)
            except (ValueError, OSError) as e:
                # ValueError covers JSONDecodeError AND UnicodeDecodeError
                # (non-UTF-8 disk corruption)
                # torn/zero-length manifest (crash before the fsync'd
                # replace landed): extraction is idempotent, so the SAFE
                # recovery is a fresh manifest (full rescan) — not an
                # unhandled JSONDecodeError the operator must hand-fix
                import logging

                logging.getLogger(__name__).warning(
                    "checkpoint at %s is unreadable (%s); starting a fresh "
                    "manifest — the idempotent rescan re-creates state", path, e,
                )
                d = {}
            d = migrate_manifest_dict(d)
            m = cls(
                path=path,
                scan_id=d.get("scan_id", scan_id),
                completed=set(d.get("completed", [])),
                state=d.get("state", "RUNNING"),
                files_processed=d.get("files_processed", 0),
                num_buckets=d.get("num_buckets"),
                settings_fingerprint=d.get("settings_fingerprint"),
                retry_count=d.get("retry_count", 0),
                last_error=d.get("last_error"),
                next_check=d.get("next_check"),
                tick_layout=d.get("tick_layout"),
                # legacy bare-int records are discarded by
                # migrate_manifest_dict above (shared with the doctor)
                input_snapshot=d.get("input_snapshot"),
                published=d.get("published"),
            )
            # refuse to mix incompatible runs; a legacy manifest without a
            # recorded fingerprint adopts the caller's (cannot verify)
            if (
                m.num_buckets is not None
                and num_buckets is not None
                and m.num_buckets != num_buckets
            ):
                raise SettingsMismatchError(
                    f"checkpoint at {path} was written with num_buckets="
                    f"{m.num_buckets}, resume requested {num_buckets}; "
                    "bucket assignments are incompatible — delete the "
                    "checkpoint (full rescan) or restore the old setting"
                )
            if (
                m.settings_fingerprint is not None
                and settings_fingerprint is not None
                and m.settings_fingerprint != settings_fingerprint
            ):
                raise SettingsMismatchError(
                    f"checkpoint at {path} was written with different "
                    "extraction settings (fingerprint "
                    f"{m.settings_fingerprint} != {settings_fingerprint}); "
                    "completed buckets would not match pending ones — "
                    "delete the checkpoint (full rescan) or restore the "
                    "old settings"
                )
            if m.num_buckets is None:
                m.num_buckets = num_buckets
            if m.settings_fingerprint is None:
                m.settings_fingerprint = settings_fingerprint
            return m
        return cls(
            path=path,
            scan_id=scan_id,
            num_buckets=num_buckets,
            settings_fingerprint=settings_fingerprint,
        )

    # --- pause control (REST /_crawler/pause analog) ----------------------

    @property
    def pause_marker(self) -> str:
        return os.path.join(os.path.dirname(self.path) or ".", "_pause")

    def pause_requested(self) -> bool:
        return os.path.exists(self.pause_marker)

    def request_pause(self) -> None:
        os.makedirs(os.path.dirname(self.pause_marker) or ".", exist_ok=True)
        with open(self.pause_marker, "w") as f:
            f.write("")

    def clear_pause(self) -> None:
        if os.path.exists(self.pause_marker):
            os.remove(self.pause_marker)

    def mark_paused(self) -> None:
        self.state = "PAUSED"
        self.save()

    # --- progress bookkeeping ---------------------------------------------

    def pending(self, num_buckets: int) -> list[int]:
        return [b for b in range(num_buckets) if b not in self.completed]

    def mark_completed(self, buckets: list[int], rows: int = 0) -> None:
        self.completed.update(buckets)
        self.files_processed += rows
        self.save()

    def add_processed(self, rows: int) -> None:
        """Bump the files_processed counter (FsCrawlerCheckpoint analog)
        once the run's lineage rows are known — the status surface
        (CLI --status / GET /status) reports it."""
        self.files_processed += int(rows)
        self.save()

    def record_error(self, err: str) -> None:
        """Wave failure: persist the error and bump the retry counter
        (FsCrawlerCheckpoint retryCount/lastError analog)."""
        self.retry_count += 1
        self.last_error = err[:2000]
        self.save()

    def reset_retries(self) -> None:
        """Successful wave: retry_count counts CONSECUTIVE failures (the
        reference resets it after a successful attempt); last_error is
        kept as history of the most recent failure."""
        if self.retry_count:
            self.retry_count = 0
            self.save()

    def set_next_check(self, epoch_seconds: float | None) -> None:
        """Persist the next scheduled scan time (updateCheckpointAsCompleted
        analog, FsParser.java:663-688). This is the EXPLICIT overwrite
        path: it replaces any on-disk value, including an earlier one."""
        self.next_check = epoch_seconds
        self._next_check_dirty = True
        try:
            self.save()
        finally:
            self._next_check_dirty = False

    def resume_running(self) -> None:
        """A resumed run is RUNNING again — without this, every
        mark_completed save would persist a stale PAUSED state and a
        crash mid-resume would leave status() claiming the job is
        waiting to be resumed."""
        if self.state != "RUNNING":
            self.state = "RUNNING"
            self.save()

    def set_tick_layout(self, layout: str) -> None:
        """Persist the incremental tick's diff layout so later ticks
        default to it (see run_incremental_update's resolution order)."""
        if layout not in ("parquet", "bucketed"):
            raise ValueError(f"tick_layout must be 'parquet' or 'bucketed', got {layout!r}")
        self.tick_layout = layout
        self.save()

    def set_input_snapshot(
        self,
        root: str | None,
        snapshot_id: int | None = None,
        table_uuid: str | None = None,
    ) -> None:
        """Record (or clear, with root=None) the input table + snapshot
        this output now corresponds to; see the field doc. Cleared by any
        mutation that breaks the output == extraction(snapshot)
        correspondence. ``table_uuid`` pins the record to the table's
        LINEAGE, not just its root path — snapshot ids restart at 1 on a
        drop-and-recreate, so a root-only record could diff the wrong
        manifests (None for legacy tables that predate the field)."""
        new = None if root is None else {"root": root, "snapshot_id": snapshot_id}
        if new is not None and table_uuid is not None:
            new["table_uuid"] = table_uuid
        if self.input_snapshot != new:
            self.input_snapshot = new
            self.save()

    def set_published(
        self,
        root: str | None,
        snapshot_id: int | None = None,
        table_uuid: str | None = None,
    ) -> None:
        """Record (or clear, with root=None) the snapshot table + id this
        output's contents were last published to; see the field doc.
        ``table_uuid`` has the same recreate-detection role as in
        set_input_snapshot."""
        new = None if root is None else {"root": root, "snapshot_id": snapshot_id}
        if new is not None and table_uuid is not None:
            new["table_uuid"] = table_uuid
        if self.published != new:
            self.published = new
            self.save()

    def finish(self) -> None:
        self.state = "COMPLETED"
        self.save()

    def status(self) -> dict:
        """Point-in-time snapshot (REST GET /_crawler/status analog)."""
        total = self.num_buckets
        return {
            "scan_id": self.scan_id,
            "state": self.state,
            "paused_requested": self.pause_requested(),
            "completed_buckets": len(self.completed),
            "pending_buckets": (total - len(self.completed)) if total else None,
            "num_buckets": total,
            "files_processed": self.files_processed,
            "retry_count": self.retry_count,
            "last_error": self.last_error,
            "next_check": self.next_check,
            "tick_layout": self.tick_layout,
            "input_snapshot": self.input_snapshot,
            "published": self.published,
        }

    def save(self) -> None:
        """Atomic write (tmp + fsync + rename), same crash-safety contract
        as FsCrawlerCheckpointFileHandler.java:45-93. The fsync matters:
        os.replace is atomic for the NAME, not the unsynced data — a
        power cut shortly after rename can otherwise leave a zero-length
        manifest.

        next_check pull-forward preservation: an external actor (REST,
        operator edit) may move next_check EARLIER on disk while the job
        holds a stale in-memory copy — an earlier on-disk value survives
        this save; set_next_check remains the explicit overwrite path."""
        if not self._next_check_dirty and os.path.exists(self.path):
            try:
                if os.stat(self.path).st_mtime_ns == self._saved_mtime_ns:
                    raise _NoExternalEdit  # we wrote last — nothing to merge
                with open(self.path) as f:
                    disk_nc = json.load(f).get("next_check")
                if disk_nc is not None and (
                    self.next_check is None or disk_nc < self.next_check
                ):
                    self.next_check = disk_nc
            except _NoExternalEdit:
                pass
            except (OSError, ValueError, TypeError):
                # unreadable/corrupt on-disk copy (incl. non-UTF-8 bytes)
                # or a hand-edited non-numeric next_check: our state wins
                # — save() must never become a hard failure
                pass
        d = {
            "scan_id": self.scan_id,
            "completed": sorted(self.completed),
            "state": self.state,
            "files_processed": self.files_processed,
            "num_buckets": self.num_buckets,
            "settings_fingerprint": self.settings_fingerprint,
            "retry_count": self.retry_count,
            "last_error": self.last_error,
            "next_check": self.next_check,
            "tick_layout": self.tick_layout,
            "input_snapshot": self.input_snapshot,
            "published": self.published,
        }
        dir_ = os.path.dirname(self.path) or "."
        os.makedirs(dir_, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=dir_, prefix=".ckpt-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(d, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
            try:
                self._saved_mtime_ns = os.stat(self.path).st_mtime_ns
            except OSError:
                self._saved_mtime_ns = None
        except BaseException:
            # ENOSPC mid-dump etc.: don't leave orphaned .ckpt-* files
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
