"""Job-state store: per (correlation_id, data_product, date) run status.

Mirrors the reference's DynamoDB tracking (steps/dynamodb.py:7-62 --
Status in {IN_PROGRESS, COMPLETED, FAILED}, optional export-prefix
attribute; the merge locates the newest COMPLETED entry that carries an
export prefix, steps/ingesters.py:343-370).  The storage backend is an
interface; the local implementation is a JSONL append log (atomic enough
for a single driver, trivially portable to DynamoDB/JDBC)."""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Optional, Protocol

IN_PROGRESS = "IN_PROGRESS"
COMPLETED = "COMPLETED"
FAILED = "FAILED"


@dataclass(frozen=True)
class JobStatus:
    correlation_id: str
    data_product: str  # e.g. "CDI-calculator:calculationParts"
    date: str  # YYYY-MM-DD
    status: str
    run_id: int = 1
    cluster_id: str = ""
    export_prefix: Optional[str] = None
    updated_at: float = 0.0


class StateStore(Protocol):
    def put(self, status: JobStatus) -> None: ...

    def latest_completed_export(self, data_product: str) -> Optional[JobStatus]: ...


class LocalStateStore:
    """Append-only JSONL log; the latest record per key wins (the same
    last-writer-wins view a DynamoDB put gives)."""

    def __init__(self, path: str):
        self._path = path

    def put(self, status: JobStatus) -> None:
        rec = asdict(status)
        rec["updated_at"] = status.updated_at or time.time()
        os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
        with open(self._path, "a") as fd:
            fd.write(json.dumps(rec) + "\n")

    def _entries(self) -> list[JobStatus]:
        if not os.path.exists(self._path):
            return []
        current: dict[tuple, JobStatus] = {}
        with open(self._path) as fd:
            for line in fd:
                if line.strip():
                    rec = JobStatus(**json.loads(line))
                    current[(rec.correlation_id, rec.data_product, rec.date)] = rec
        return list(current.values())

    def latest_completed_export(self, data_product: str) -> Optional[JobStatus]:
        """Newest (by date) COMPLETED entry carrying an export prefix --
        the lookup the snapshot merge starts from
        (reference steps/ingesters.py:345-366)."""
        candidates = [
            e
            for e in self._entries()
            if e.data_product == data_product
            and e.status == COMPLETED
            and e.export_prefix
        ]
        if not candidates:
            return None
        return max(candidates, key=lambda e: e.date)

    def entries(self, data_product: str | None = None) -> list[JobStatus]:
        out = self._entries()
        if data_product:
            out = [e for e in out if e.data_product == data_product]
        return out
