#!/usr/bin/env python3
"""Recall-vs-cost sweep for the IVF and PQ ANN operators (VERDICT r5 #5).

Measures actual recall@5 (vs the exact brute-force baseline) and
wall-clock for a grid of (n_lists, n_probe) [IVF] and (m, n_candidates)
[PQ] at a given sf, so the certificate floors in
workloads/similarity_search.py can be raised to measured-minus-margin
instead of a generous 0.70.

The corpus (driver `embeddings` table) is nearly isotropic -- the worst
case for partition-based ANN -- so these curves are the honest lower
bound; clustered real-world embeddings do better at every setting.

Usage: python tools/ann_recall_sweep.py [sf_dir]
Prints a markdown table (paste into ROUND_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from dataworks_aws_corporate_data_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        pq_topk,
    )
    from dataworks_aws_corporate_data_ingestion_spark.session import get_session
    from dataworks_aws_corporate_data_ingestion_spark.sources.tables import load_table

    spark = get_session(app_name="ann-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, "embeddings", sf_dir).cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(df) -> tuple[float, int]:
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & exact) / len(exact), len(got)

    print(f"corpus={n_corpus} ({sf_dir}), |exact pairs|={len(exact)}\n")
    print("IVF recall@5 (isotropic worst case):\n")
    print("| n_lists | n_probe | recall | sec |")
    print("|---|---|---|---|")
    ivf_results = []
    for n_lists in (8, 16, 32):
        for n_probe in (2, 4, 8, 12):
            if n_probe >= n_lists:
                continue
            t0 = time.perf_counter()
            r, _ = recall(
                ivf_topk(emb, queries, dim=64, k=5, n_lists=n_lists, n_probe=n_probe)
            )
            dt = time.perf_counter() - t0
            ivf_results.append((n_lists, n_probe, r, dt))
            print(f"| {n_lists} | {n_probe} | {r:.3f} | {dt:.2f} |")

    print("\nPQ recall@5 (ADC + exact re-rank):\n")
    print("| m | n_candidates | recall | sec |")
    print("|---|---|---|---|")
    pq_results = []
    for m in (8, 16):
        for n_candidates in (64, 128, 256, 512):
            t0 = time.perf_counter()
            r, _ = recall(
                pq_topk(emb, queries, dim=64, k=5, m=m, n_candidates=n_candidates)
            )
            dt = time.perf_counter() - t0
            pq_results.append((m, n_candidates, r, dt))
            print(f"| {m} | {n_candidates} | {r:.3f} | {dt:.2f} |")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
