"""Custom Python DataSource (Spark 4 API) over the job-state store.

The reference's DynamoDB tracking table is queried driver-side
(plans/state.py mirrors that); but auditing/reporting over run history
("all runs last quarter, failure rate per collection") wants the state
store AS A TABLE.  This DataSource exposes exactly that through Spark's
Python DataSource V2 API (`spark.read.format("cdi_state")`):

* `schema()` declares the JobStatus columns (late schema imposition on a
  schemaless JSONL log -- same F16 discipline as the envelope parse).
* `partitions()` splits the read by status value, so a filtered audit
  (`WHERE status='FAILED'`) still parallelises and each task emits only
  its slice.  Each task resolves last-writer-wins per (correlation_id,
  data_product, date) over the whole log and then keeps the winners
  whose status matches its partition; a catch-all partition carries any
  winner whose status is outside the known triple -- so the union over
  the partitions equals the LocalStateStore view exactly, with no
  cross-partition duplicates and no silently-dropped novel statuses.

The path is validated on the DRIVER at reader construction: a missing
log is a loud error, not an empty table (an absent-on-executor path on
a real cluster must not read as "no runs ever happened").  Callers that
genuinely want empty-on-missing opt in with option("allow_missing",
"true").

This is the idiomatic Spark-4 answer for small/medium external systems
with no native connector (REST services, DynamoDB scans, job queues):
a few dozen lines of Python, partition-parallel, and the result is a
first-class DataFrame that joins/filters like any table.  At real scale
the same class shape partitions by segment ids (DynamoDB parallel scan
segments) instead of enum values.

Reference: steps/dynamodb.py:7-62 (table shape), steps/ingesters.py:
343-370 (scan usage).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("correlation_id", StringType()),
        StructField("data_product", StringType()),
        StructField("date", StringType()),
        StructField("status", StringType()),
        StructField("run_id", IntegerType()),
        StructField("cluster_id", StringType()),
        StructField("export_prefix", StringType()),
        StructField("updated_at", DoubleType()),
    ]
)

_STATUSES = ("IN_PROGRESS", "COMPLETED", "FAILED")

# sentinel partition value: winners whose status is NOT in _STATUSES
_OTHER = "__OTHER__"


class _StatusPartition(InputPartition):
    def __init__(self, status: str):
        self.status = status


class StateStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("cdi_state requires option 'path' (JSONL log)")
        allow_missing = str(options.get("allow_missing", "false")).lower() in (
            "true",
            "1",
        )
        import os

        if not os.path.exists(path) and not allow_missing:
            raise FileNotFoundError(
                f"cdi_state log not found at {path!r}; pass "
                "option('allow_missing','true') to read an absent log as empty"
            )
        self._path = path

    def partitions(self):
        return [_StatusPartition(s) for s in (*_STATUSES, _OTHER)]

    def read(self, partition: _StatusPartition):
        # each task resolves last-writer-wins over the full (small) log,
        # then emits only the winners whose status matches its slice --
        # the union across the partitions (incl. the catch-all) is
        # exactly the LWW view
        current: dict[tuple, dict] = {}
        try:
            fd = open(self._path)
        except FileNotFoundError:
            # only reachable under allow_missing (driver validated above)
            return
        with fd:
            for line in fd:
                if line.strip():
                    rec = json.loads(line)
                    key = (
                        rec.get("correlation_id"),
                        rec.get("data_product"),
                        rec.get("date"),
                    )
                    current[key] = rec
        for rec in current.values():
            status = rec.get("status")
            if partition.status == _OTHER:
                if status in _STATUSES:
                    continue
            elif status != partition.status:
                continue
            # explicit None checks: `or` would also catch a legitimate
            # 0, silently rewriting run_id 0 -> 1 / updated_at 0 -> 0.0
            rid = rec.get("run_id")
            upd = rec.get("updated_at")
            yield (
                rec.get("correlation_id"),
                rec.get("data_product"),
                rec.get("date"),
                status,
                int(rid) if rid is not None else 1,
                rec.get("cluster_id", ""),
                rec.get("export_prefix"),
                float(upd) if upd is not None else 0.0,
            )


class StateStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdi_state"

    def schema(self) -> StructType:
        return STATE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return StateStoreReader(self.options)


def register_state_source(spark) -> None:
    """Idempotent registration; after this,
    spark.read.format('cdi_state').option('path', p).load() works."""
    spark.dataSource.register(StateStoreDataSource)
