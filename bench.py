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

from dataworks_aws_corporate_data_ingestion_spark.session import get_session
from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES


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

    total_start = time.perf_counter()
    for name, spec in bench_queries.items():
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
    total = round(time.perf_counter() - total_start, 3)

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
