"""Ops logging for streaming queries (SURVEY.md §2 streaming table:
"Ops logging — CloudWatch log group per delivery stream",
cdk_datalake_mvp_stack.py:169-173 → StreamingQueryListener / progress JSON).

``ProgressLogger`` captures one JSON record per micro-batch (query id,
batch id, input rows, processed rows/s, sink description, durations) in
memory and optionally appends JSON lines to a file — the engine analog of
the Firehose delivery-stream log group.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogger(StreamingQueryListener):
    """Collects per-batch progress; optionally tees JSON lines to a file.

    Thread-safe: listener callbacks fire on Spark's listener bus thread.
    """

    def __init__(self, log_path: str | None = None) -> None:
        self.log_path = log_path
        self.started: list[dict] = []
        self.progress: list[dict] = []
        self.terminated: list[dict] = []
        self._lock = threading.Lock()

    def _append(self, bucket: list[dict], rec: dict) -> None:
        with self._lock:
            bucket.append(rec)
            if self.log_path:
                with open(self.log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append(self.started, {
            "event": "started", "id": str(event.id), "name": event.name,
            "timestamp": event.timestamp,
        })

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(self.progress, {
            "event": "progress",
            "id": str(p.id),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
            "sink": p.sink.description if p.sink else None,
        })

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self._append(self.terminated, {
            "event": "terminated", "id": str(event.id),
            "exception": event.exception,
        })
