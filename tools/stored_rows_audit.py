#!/usr/bin/env python3
"""Assert the per-day stored-row bounds the sketch-rollup entries claim
(r8 verdict item #4 tail: 'the <=40-integers/day claim asserted at sf10').

For a given sf_dir (default .scaledata/sf10.0) this rebuilds the stored
state each rollup family materialises and MEASURES the per-day (or
per-group-day / per-batch) row counts, asserting each family's bound:

  drift daily histogram   <= 40 rows/day   (_DRIFT_BINS,
                                            drift_from_stored_histograms)
  windowed MG summaries   <= k=127 rows/day (heavy_hitters_windowed_mg)
  grouped quantile bins   <= 200 rows per (group, day)
                                            (grouped_quantile_rollup_*)
  weighted CMS partials   <= d*w + 1 rows per admitted batch
                                            (cms_admission_weighted_*)

Bounds are structural (bin count / summary size), so they hold at ANY
scale; this tool turns the claim into a measured number at the largest
generated sf.  Usage:

    python tools/stored_rows_audit.py [sf_dir] [--out FILE]

Prints one JSON line {family: {max_rows_per_day, bound, ok}} and exits
non-zero if any bound is violated.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from dataworks_aws_corporate_data_ingestion_spark.operators.heavyhitters import (
        mg_summary_by_group,
    )
    from dataworks_aws_corporate_data_ingestion_spark.operators.histsketch import (
        daily_histogram,
        grouped_daily_histogram,
    )
    from dataworks_aws_corporate_data_ingestion_spark.operators.cms import cms_sketch
    from dataworks_aws_corporate_data_ingestion_spark.session import get_session
    from dataworks_aws_corporate_data_ingestion_spark.sources.tables import load_table
    from dataworks_aws_corporate_data_ingestion_spark.workloads.approx_exact import (
        _CMS_D,
        _CMS_W,
        _HIST_BINS,
        _HIST_SPAN_CENTS,
        _MG_K,
    )
    from dataworks_aws_corporate_data_ingestion_spark.workloads.audit_stats import (
        _DRIFT_BINS,
        _DRIFT_SPAN_CENTS,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", "sf10.0",
    )
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    spark = get_session(app_name="cdi-stored-rows-audit")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, "events", sf_dir)

    report: dict[str, dict] = {}

    def record(family: str, max_rows: int, bound: int, unit: str) -> None:
        report[family] = {
            "max_stored_rows": int(max_rows),
            "bound": int(bound),
            "per": unit,
            "ok": bool(max_rows <= bound),
        }
        print(f"{family}: max {max_rows} / bound {bound} per {unit} "
              f"{'OK' if max_rows <= bound else 'VIOLATED'}", flush=True)

    # drift dashboard rows (drift_from_stored_histograms)
    drift = daily_histogram(e, "ts", "value", _DRIFT_BINS, _DRIFT_SPAN_CENTS)
    m = (
        drift.groupBy("day").agg(F.count(F.lit(1)).alias("r"))
        .agg(F.max("r")).collect()[0][0]
    )
    record("drift_daily_histogram", m, _DRIFT_BINS, "day")

    # windowed MG summaries (heavy_hitters_windowed_mg's whm_idx shape)
    key = F.when(F.col("event_type") == "click", F.lit("hot")).otherwise(
        F.concat(F.lit("u"), F.pmod(F.col("user_id"), F.lit(16)).cast("string"))
    )
    keyed = e.select(F.col("ts").cast("date").alias("day"), key.alias("key"))
    mg = (
        mg_summary_by_group(keyed, "day", ["key"], _MG_K)
        .groupBy("day", "key").agg(F.sum("c").alias("c"))
    )
    m = (
        mg.groupBy("day").agg(F.count(F.lit(1)).alias("r"))
        .agg(F.max("r")).collect()[0][0]
    )
    record("windowed_mg_summaries", m, _MG_K, "day")

    # grouped quantile rollup (grouped_quantile_rollup_certificate)
    gq = grouped_daily_histogram(
        e, "event_type", "ts", "value", _HIST_BINS, _HIST_SPAN_CENTS
    )
    m = (
        gq.groupBy("g", "day").agg(F.count(F.lit(1)).alias("r"))
        .agg(F.max("r")).collect()[0][0]
    )
    record("grouped_quantile_bins", m, _HIST_BINS, "group-day")

    # weighted CMS batch partial (cms_admission_weighted_certificate's
    # per-admission append: the d x w cell sketch + 1 marker row)
    keyed_c = e.select(
        F.concat(
            F.col("event_type"), F.lit(":"),
            F.pmod(F.col("user_id"), F.lit(32)).cast("string"),
        ).alias("key"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    m = cms_sketch(keyed_c, "key", _CMS_W, _CMS_D, weight_col="cents").count()
    record("weighted_cms_batch_partial", m + 1, _CMS_D * _CMS_W + 1, "batch")

    line = json.dumps({"sf_dir": sf_dir, "families": report})
    print(line)
    if out_file:
        with open(out_file, "w") as fd:
            fd.write(line + "\n")
    spark.stop()
    return 0 if all(r["ok"] for r in report.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
