#!/usr/bin/env python3
"""Headline benchmark: run the bench-flagged workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import shutil
import tempfile

from dataworks_aws_corporate_data_ingestion_spark.session import get_session
from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES, WRITE_BENCHES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="cdi-engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: s for n, s in QUERIES.items() if s.bench}
    timings: dict[str, float] = {}

    # warm every benched plan once at the smallest SF: first execution pays
    # JVM codegen + Python-UDF worker spin-up, which would otherwise be
    # charged to whichever query happens to hit it first
    for spec in bench_queries.values():
        spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    # best-of-N: the harness shares a host, so single-shot timings carry
    # external load spikes; the minimum is the cleanest estimate of what
    # the plan itself costs.  Default raised 3 -> 5 so round-over-round
    # diffs outrun the host's ~3x load swings.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    out_dir = tempfile.mkdtemp(prefix="cdi-bench-")
    try:
        for name, spec in bench_queries.items():
            best = float("inf")
            for _ in range(repeats):
                start = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
            timings[name] = round(best, 3)
        # write-path headline ops (ordered: merge reads write_daily's output)
        for name, fn in WRITE_BENCHES.items():
            best = float("inf")
            for _ in range(repeats):
                start = time.perf_counter()
                fn(spark, sf_dir, out_dir)
                best = min(best, time.perf_counter() - start)
            timings[name] = round(best, 3)
        total = round(sum(timings.values()), 3)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
