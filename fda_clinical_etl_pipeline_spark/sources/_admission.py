"""Admission control for the custom streaming sources — the
``SupportsAdmissionControl`` semantics (Delta's ``maxFilesPerTrigger``,
Kafka's ``maxOffsetsPerTrigger``) expressed through the Spark 4 Python
DataSource API.

Why: ``latestOffset()`` returning "the newest table version" means a
cold start — or recovery after downtime — against a backlogged 100 TB
table plans the ENTIRE backlog as ONE micro-batch: one giant commit,
one giant state update, executor spill. Real sources bound each batch
and catch up over several; these options do the same:

- ``max_versions_per_batch``: advance the offset at most N table
  versions (commits / metadata versions / instants) past the last
  planned one per trigger;
- ``max_files_per_batch``: walk the pending versions in order and cut
  the batch once the cumulative file count reaches N (always admitting
  at least one version, so a single over-wide commit cannot stall the
  stream).

Safety across restarts: the Python API's ``latestOffset()`` receives
no start offset, so a rate-limited advance must be measured from
reader state. That state is trustworthy because Spark's JVM wrapper
(``PythonMicroBatchStream``) implements ``AcceptsLatestSeenOffset``:
on restart the checkpointed offset is forwarded to this reader as a
``partitions(offset, offset)`` handshake BEFORE the first
``latestOffset()`` call, and every planned batch flows through
``partitions(start, end)`` too. ``note_seen`` folds all of those in,
so the bounded advance is always measured from the newest offset the
query has actually planned — never behind the checkpoint (which would
corrupt the offset log), never skipping data.

Trigger.AvailableNow caveat: Spark captures one ``latestOffset()`` at
query start as the run's end-target for plain MicroBatchStream
sources, so an availableNow run processes ONE admitted batch and
stops; re-run to continue catching up (the checkpoint carries the
position). Continuous / processing-time triggers catch up over
successive micro-batches automatically.
"""

from __future__ import annotations

from typing import Callable, Iterable, TypeVar

V = TypeVar("V")  # offset scalar: int version or str instant


class AdmissionControl:
    """Per-reader admission state. ``key`` is the offset-dict field
    holding the scalar position (``"version"`` / ``"instant"``)."""

    def __init__(self, options: dict, key: str, initial: V) -> None:
        self.key = key
        mv = options.get("max_versions_per_batch")
        mf = options.get("max_files_per_batch")
        self.max_versions = int(mv) if mv is not None else None
        self.max_files = int(mf) if mf is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("max_versions_per_batch must be >= 1")
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("max_files_per_batch must be >= 1")
        self._last_seen: V = initial

    @property
    def unbounded(self) -> bool:
        return self.max_versions is None and self.max_files is None

    def note_seen(self, *offsets: dict) -> None:
        """Fold planned-batch boundaries (and the restart handshake's
        ``partitions(o, o)``) into the admission base."""
        for o in offsets:
            v = o[self.key]
            if v > self._last_seen:
                self._last_seen = v

    def admit(
        self,
        head: V,
        pending_of: Callable[[V, V], Iterable[V]],
        files_of: Callable[[V], int] | None = None,
    ) -> V:
        """Bounded head for ``latestOffset``: at most
        ``max_versions_per_batch`` versions / ``max_files_per_batch``
        cumulative files past the newest planned offset.

        ``pending_of(lo, hi)`` yields version ids in (lo, hi] in
        order; it is only consumed up to the admitted prefix, so a
        deep backlog never costs more than the admitted window plus
        one. ``files_of`` is consulted only under a file limit."""
        base = self._last_seen
        if self.unbounded:
            return head
        if head <= base:
            # base is always an offset Spark has already seen (it
            # folds only returned/planned offsets), so echoing it
            # never moves the offset log backward
            return base
        out: V | None = None
        n_versions = 0
        n_files = 0
        for v in pending_of(base, head):
            if (self.max_versions is not None
                    and n_versions >= self.max_versions):
                break
            if (self.max_files is not None and out is not None
                    and n_files >= self.max_files):
                break
            out = v
            n_versions += 1
            if self.max_files is not None and files_of is not None:
                n_files += files_of(v)
        admitted = head if out is None else out
        # the admitted offset becomes a planned batch (every
        # latestOffset result is either executed or superseded by the
        # restart handshake), so it is the next advance's base
        self.note_seen({self.key: admitted})
        return admitted
