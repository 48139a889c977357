"""Continuous validation over an Iceberg table: poll → delta → validate.

Structured Streaming cannot source from the pure-Python Iceberg reader
(that needs the runtime jar's streaming source), but the semantics a
continuous validation pipeline needs are exactly incremental processing
with a durable cursor — which the snapshot log already provides.
:class:`SnapshotMonitor` polls the table's current snapshot; when it
advances, it validates ONLY the appended files
(:meth:`~..sources.iceberg_py.PyIcebergTable.incremental`) and advances a
durable cursor, so a restarted monitor resumes where it left off without
re-validating history — the micro-batch loop of a streaming job, with the
snapshot log as the offset log.

Cite: the reference validates one immutable bundle per request
(``Core/ValidationPipeline.cs:486-604``); this is that contract applied
repeatedly to a growing table, each batch pinned to a snapshot range.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

from ..engine import ValidationEngine, ValidationResult
from ..fsutil import exists, read_bytes, write_bytes_atomic
from ..sources.iceberg_py import PyIcebergTable


class SnapshotMonitor:
    """Incremental validation driver over a :class:`PyIcebergTable`.

    ``cursor_path`` (any Spark-writable scheme) persists the last
    validated snapshot id; omit it for an in-memory cursor.

    Baseline semantics: attached to a table that ALREADY has snapshots,
    the monitor adopts the current snapshot as the baseline (monitor-
    from-now; pass ``from_snapshot=SnapshotMonitor.GENESIS`` to backfill
    the whole table, or an explicit snapshot id to start after it).
    Attached to an EMPTY table, the baseline is genesis: the table's
    first snapshot is validated in full when it appears — a monitor set
    up before the pipeline's first write must not silently skip it.
    """

    #: cursor sentinel: validate everything from the table's first snapshot
    GENESIS = -1

    def __init__(self, table: PyIcebergTable, engine: ValidationEngine,
                 cursor_path: str | None = None,
                 from_snapshot: int | None = None):
        self.table = table
        self.engine = engine
        self.cursor_path = cursor_path
        # the DURABLE cursor wins when it exists: ``from_snapshot`` is a
        # first-run default, not a standing override — a supervisor
        # restarting the monitor with the same constructor args (e.g.
        # GENESIS backfill) must resume, not re-validate all history on
        # every restart
        self._cursor = None
        if cursor_path is not None and exists(table.spark, cursor_path):
            try:
                self._cursor = json.loads(
                    read_bytes(table.spark,
                               cursor_path).decode())["snapshot_id"]
            except (ValueError, KeyError):
                # writes are temp+rename atomic, so a corrupt cursor only
                # predates that fix (or the store lost the rename): fall
                # back to from_snapshot instead of wedging every restart
                # on json.loads (round-5 review batch 8); at-least-once —
                # re-validation, never skipped data
                self._cursor = None
        if self._cursor is None:
            self._cursor = from_snapshot

    @property
    def cursor(self) -> int | None:
        return self._cursor

    def _save_cursor(self) -> None:
        if self.cursor_path is not None:
            # temp+rename: a plain create() truncates the live cursor
            # before writing, so a crash mid-write corrupts it and every
            # restart dies on json.loads (round-5 review batch 8)
            write_bytes_atomic(
                self.table.spark, self.cursor_path,
                json.dumps({"snapshot_id": self._cursor}).encode())

    def poll_once(self, commit: bool = True
                  ) -> tuple[int, ValidationResult] | None:
        """One micro-batch: validate data appended since the cursor.

        Returns ``(new_snapshot_id, result)``, or ``None`` when the table
        has not advanced. The cursor moves (and persists) only AFTER the
        validation plan is materialized — a crash mid-batch re-validates
        the same delta on restart (at-least-once, idempotent because the
        input snapshot range is immutable).

        ``commit=False`` defers the cursor entirely: the caller durably
        persists the result FIRST, then calls :meth:`commit` — closing
        the window where a crash after the cursor advanced but before
        the result reached its sink would lose that delta's findings
        (:meth:`run` uses this internally: it commits only after the
        consumer resumes the generator, i.e. has taken the batch)."""
        try:
            current = self.table.current_snapshot_id()
        except ValueError:                      # table has no snapshots yet
            if self._cursor is None:
                # first contact with an EMPTY table: baseline = genesis,
                # so the first snapshot gets validated when it appears
                self._cursor = self.GENESIS
                self._save_cursor()
            return None
        if self._cursor is None:
            # first contact with existing data: adopt current (monitor-
            # from-now; see class docstring for the backfill options)
            self._cursor = current
            self._save_cursor()
            return None
        if current == self._cursor:
            return None
        if self._cursor == self.GENESIS:
            delta = self.table.read(current)    # full backfill batch
        else:
            try:
                if self._append_only_since(self._cursor):
                    delta = self.table.incremental(self._cursor, current)
                else:
                    # a compaction / COW rewrite restates live files at a
                    # higher sequence number, so incremental() would
                    # re-read the ENTIRE table as the "delta" and
                    # re-report every historical violation as new
                    # (round-5 review batch 8). changes() nets rewrites
                    # away (pure compaction = empty changelog); the NET
                    # INSERTED rows are exactly the new data to validate.
                    delta = (self.table
                             .changes(self._cursor, current)
                             .where("_change_type = 'insert'")
                             .drop("_change_type"))
            except ValueError:
                # the cursor's snapshot was expired (expire_snapshots) —
                # the incremental range is gone, so fall back to a full
                # validation of the current snapshot rather than wedging
                # the monitor forever (at-least-once: rows validated
                # before expiry are validated again, never skipped)
                delta = self.table.read(current)
        result = self.engine.validate(delta)
        # materialize before the cursor moves (see docstring)
        result.violations.count()
        if commit:
            self.commit(current)
        return current, result

    def _append_only_since(self, cursor: int) -> bool:
        """True when every commit between the cursor and the current head
        only ADDED data files (append/replace-free history in the
        ``incremental`` sense): the cheap added-files delta is then the
        exact new-data set. A cursor outside the current ancestry raises
        ValueError so the caller's expiry fallback handles it."""
        snaps = {r["snapshot_id"]: r
                 for r in self.table.snapshots().collect()}
        sid = self.table.current_snapshot_id()
        while sid is not None and sid in snaps:
            if sid == cursor:
                return True
            if snaps[sid]["operation"] not in ("append",):
                return False
            sid = snaps[sid]["parent_id"]
        raise ValueError(f"cursor snapshot {cursor} not in the current "
                         f"ancestry")

    def commit(self, snapshot_id: int) -> None:
        """Advance and persist the cursor to ``snapshot_id`` — the
        acknowledge step of the ``poll_once(commit=False)`` protocol."""
        self._cursor = snapshot_id
        self._save_cursor()

    def run(self, max_polls: int, interval_s: float = 0.0
            ) -> Iterator[tuple[int, ValidationResult]]:
        """Bounded poll loop (a driver-side micro-batch trigger): yields
        each non-empty batch's (snapshot_id, result). The cursor commits
        AFTER the consumer resumes the generator — a consumer that dies
        mid-batch (before asking for the next one) re-validates the same
        delta on restart instead of silently losing it."""
        for i in range(max_polls):
            out = self.poll_once(commit=False)
            if out is not None:
                yield out
                self.commit(out[0])
            if interval_s and i + 1 < max_polls:
                time.sleep(interval_s)
