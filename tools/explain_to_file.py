#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named registry entries to
plans/<round>/<name>_<suffix>.txt (round from $SPARK_GRAFT_PLANS_ROUND, default r11) -- the judge-facing before/after plan
evidence for the optimization round.

Usage: python tools/explain_to_file.py SUFFIX NAME [NAME...]
       (SUFFIX is `before` or `after`; sf dir from $SPARK_GRAFT_SF_DIR,
       default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    from dataworks_aws_corporate_data_ingestion_spark.session import get_session
    from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

    spark = get_session(app_name="cdi-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = QUERIES[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
