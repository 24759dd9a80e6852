"""Event-driven stream-completion gate (VERDICT r6 #7): wait for a
memory-sink stream to deliver N rows by LISTENING to micro-batch
progress events instead of polling ``SELECT COUNT(*)`` every 200 ms —
the poll re-scanned the sink per tick; the listener does zero scans and
wakes exactly when a batch lands."""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class RowCountGate(StreamingQueryListener):
    """Sums each micro-batch's ``sink.numOutputRows`` for one query id
    and sets an event once the total reaches the target (or the query
    terminates — a dead query can never reach it, so waiters must not
    block out the full timeout).

    Batches are deduplicated by batchId: the caller seeds the gate from
    ``recentProgress`` to cover batches that completed before the
    listener attached, and a batch straddling the attach point would
    otherwise count twice. A failed batch re-run reuses its batchId, so
    retries don't double-count either.
    """

    def __init__(self, query_id: str, n_rows: int) -> None:
        self.query_id = query_id
        self.n_rows = n_rows
        self.delivered = 0
        self.terminated = False
        self.event = threading.Event()
        self._lock = threading.Lock()
        self._seen: set[int] = set()

    def offer(self, query_id: str, batch_id: int, num_rows: int) -> None:
        if str(query_id) != self.query_id:
            return
        with self._lock:
            if batch_id in self._seen:
                return
            self._seen.add(batch_id)
            # -1 means the sink doesn't report (not the case for the
            # memory sink, but guard it)
            if num_rows and num_rows > 0:
                self.delivered += num_rows
            if self.delivered >= self.n_rows:
                self.event.set()

    def offer_progress(self, progress) -> None:
        """Accept either a StreamingQueryProgress object (listener
        events, Spark 4) or its dict form (``recentProgress``)."""
        if isinstance(progress, dict):
            self.offer(
                progress["id"],
                int(progress["batchId"]),
                int(progress.get("sink", {}).get("numOutputRows", 0) or 0),
            )
        else:
            self.offer(
                progress.id, int(progress.batchId), int(progress.sink.numOutputRows)
            )

    def onQueryStarted(self, event) -> None:  # pragma: no cover - unused
        pass

    def onQueryProgress(self, event) -> None:
        self.offer_progress(event.progress)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if str(event.id) == self.query_id:
            self.terminated = True
            self.event.set()
