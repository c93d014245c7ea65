"""Collection pipeline runner: config, registry, date-range driver loop.

The engine's generalisation of the reference's hard-coded collection
dispatch (steps/corporate_data_ingestion.py:80-117 + the ingesters_map at
:95-98): collections are *configs*, not subclasses, and a day-range run is
one status-tracked `run_day` per date, fail-fast, idempotent re-runs via
dynamic partition overwrite.
"""

from __future__ import annotations

import argparse
import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..functions.crypto import IdentityKeyService, KeyService
from ..operators.ingest import ingest_daily
from ..sinks.writers import write_daily, write_jsonl
from . import state as state_mod
from .state import JobStatus, LocalStateStore, StateStore


@dataclass(frozen=True)
class CollectionSpec:
    """Per-collection pipeline configuration (replaces the reference's
    BaseIngester/BusinessAuditIngester/CalculationPartsIngester class
    hierarchy with data)."""

    name: str  # "db:collection"
    source_root: str  # landing prefix; {date} expands to YYYY/MM/DD
    output_root: str
    audit: bool = False  # apply the businessAudit context transform
    sink: str = "keyed"  # "keyed" (partitioned columnar) | "jsonl"
    sink_format: str = "parquet"
    compression: str = "snappy"

    def source_for(self, date: str) -> str:
        y, m, d = date.split("-")
        return (
            self.source_root.replace("{date}", f"{y}/{m}/{d}")
            if "{date}" in self.source_root
            else f"{self.source_root}/{y}/{m}/{d}"
        )


@dataclass
class EngineConfig:
    correlation_id: str
    start_date: str
    end_date: str
    collection: CollectionSpec
    state_path: str
    key_service: KeyService = field(default_factory=IdentityKeyService)


def date_range(start: str, end: str) -> list[str]:
    d0 = dt.date.fromisoformat(start)
    d1 = dt.date.fromisoformat(end)
    return [
        (d0 + dt.timedelta(days=i)).isoformat() for i in range((d1 - d0).days + 1)
    ]


def run_day(spark: SparkSession, cfg: EngineConfig, date: str) -> int:
    """One day's ingest; returns quarantined-row count."""
    spec = cfg.collection
    rows, quarantined = ingest_daily(
        spark,
        spec.source_for(date),
        spec.name,
        cfg.key_service,
        date,
        audit=spec.audit,
    )
    if spec.sink == "jsonl":
        write_jsonl(
            rows.select("val"), f"{spec.output_root}/{date}", compression=spec.compression
        )
    else:
        write_daily(
            rows, spec.output_root, fmt=spec.sink_format, compression=spec.compression
        )
    return quarantined.count()


def run_range(spark: SparkSession, cfg: EngineConfig) -> None:
    """Per-day loop with fail-fast status tracking (reference
    steps/corporate_data_ingestion.py:100-117)."""
    store: StateStore = LocalStateStore(cfg.state_path)
    product = f"CDI-{cfg.collection.name}"
    for date in date_range(cfg.start_date, cfg.end_date):
        base = dict(
            correlation_id=cfg.correlation_id, data_product=product, date=date
        )
        store.put(JobStatus(status=state_mod.IN_PROGRESS, **base))
        try:
            run_day(spark, cfg, date)
        except Exception:
            store.put(JobStatus(status=state_mod.FAILED, **base))
            raise
        store.put(JobStatus(status=state_mod.COMPLETED, **base))


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="CDI-spark collection runner")
    p.add_argument("--collection", required=True, help="db:collection")
    p.add_argument("--source-root", required=True)
    p.add_argument("--output-root", required=True)
    p.add_argument("--start-date", required=True)
    p.add_argument("--end-date", required=True)
    p.add_argument("--correlation-id", default="local-run")
    p.add_argument("--state-path", default="./job_state.jsonl")
    p.add_argument("--audit", action="store_true")
    p.add_argument("--sink", choices=["keyed", "jsonl"], default="keyed")
    return p


def main(argv: list[str] | None = None) -> int:
    from ..session import get_session

    args = build_arg_parser().parse_args(argv)
    spec = CollectionSpec(
        name=args.collection,
        source_root=args.source_root,
        output_root=args.output_root,
        audit=args.audit,
        sink=args.sink,
    )
    cfg = EngineConfig(
        correlation_id=args.correlation_id,
        start_date=args.start_date,
        end_date=args.end_date,
        collection=spec,
        state_path=args.state_path,
    )
    spark = get_session(app_name=f"cdi-{args.collection}")
    run_range(spark, cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
