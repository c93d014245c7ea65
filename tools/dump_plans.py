#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans for representative
queries, as reviewable evidence of pushdown/broadcast/codegen quality.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SHOWCASE = [
    ("q1_pricing_summary", "filtered scan -> partial/final hash agg"),
    ("q5_revenue_by_nation", "fact-fact shuffle join + broadcast dims"),
    ("q19_disjunctive_revenue", "OR-of-ANDs pushed into both scans"),
    ("snapshot_merge_latest", "union -> single range exchange -> window top-1"),
    ("cdi_ingest_pipeline", "two-Arrow-crossing encrypted ingest chain"),
    ("near_dup_pairs_minhash", "shingle -> sign -> band -> bucket join -> verify"),
    ("ann_lsh_topk", "single-pass multi-table signatures + broadcast probe"),
    ("sessionization_30min", "one window shuffle reused by the aggregate"),
    ("asof_last_view_before_purchase", "union-trick as-of join, no range join"),
    ("top_terms_by_source", "explode absorbed by map-side partial agg"),
    ("q21_waiting_supplier", "EXISTS/NOT-EXISTS pair as one per-order aggregate"),
    ("q22_lapsed_balance_report", "broadcast scalar aggregate + anti join"),
    ("bm25_top_docs", "JVM lambda tf/dl + one broadcast stats row + TakeOrdered"),
    ("curation_pipeline", "filter/grade/cluster/sample chain, one corpus shuffle"),
    ("near_dup_pairs_incremental", "delta buckets vs union buckets; no corpus self-join"),
    ("benchmark_contamination", "corpus shingle explode semi-joins benchmark universe"),
    ("pii_redaction_stats", "pure regexp codegen chain, zero shuffles"),
    ("doc_repetition_stats", "two map-side-combined aggregates over bigrams"),
    ("training_shards", "one hash exchange on shard + per-shard window sort"),
    ("user_value_hourly_range", "RANGE frame: one user shuffle, sliding in-sort"),
    ("daily_new_users", "first-seen rewrite: two partial aggs, days-sized window"),
    ("purchases_attributed_views", "equi-join on user, range predicate post-join"),
    ("simhash_near_dups", "all-JVM 60-bit md5 simhash: 60 codegen agg exprs + banded self-join"),
    ("events_session_window_builtin", "one user shuffle -> UpdatingSessions merge"),
    ("events_sliding_windows", "4x window explode absorbed by map-side partials"),
    ("trailing_7d_active_users", "collapse-then-explode sliding distinct"),
    ("user_value_forward_fill", "IGNORE NULLS running frame, one shuffle"),
    ("embedding_l2_norms", "HOF fold in-row: zero exchange"),
    ("incremental_monthly_rollup", "two-level partial-agg merge"),
    ("leakage_safe_split", "LSH pairs -> components -> cluster-hashed split"),
    ("dup_ngram_span_stats", "gram-key agg -> dup join-back -> one doc_id exchange for both span windows -> positional-filter rebuild"),
    ("dup_ngram_spans_incremental", "delta counts vs corpus counts; only delta positions reach the span merge"),
    ("bigram_lm_familiarity", "two vocab-sized count aggs broadcast against the bigram stream"),
    ("textrank_keywords", "5 checkpointed join+agg rounds over a vocabulary-sized graph"),
    ("curation_pipeline_spanlm", "mask -> integer gate -> LM on masked corpus -> OOV gate -> rollup"),
    ("knn_label_classification", "broadcast probes -> corpus scan -> vote argmax"),
    ("source_vocabulary_overlap", "DISTINCT-collapsed vocab self-join; vocab-bounded"),
    ("per_source_ngram_novelty", "distinct (source, gram) -> spread count -> rollup"),
    ("bm25_search_with_deletions", "tombstone anti-join on bucketed postings; dims pre-corrected at delete time"),
    ("approx_distinct_certificate", "HLL registers + exact distinct side-by-side, one grouped agg"),
    ("hll_mergeable_rollup_certificate", "per-day sketch agg -> union-merge agg; state bytes, not rows"),
    ("heavy_hitters_mg_exact", "bounded-state MG mapInPandas -> broadcast candidate semi-join -> sliver-only recount"),
    ("returning_users_bloom_semi", "bit_or-packed bloom build -> map-side ArrowEvalPython probe -> sliver verify join"),
    ("cross_corpus_dedup_bloom", "one bloom_classify pass: scan-stage probe, only positives join"),
    ("event_revenue_auto_skew_join", "MG-detected hot set -> salted hot slice + plain cold slice -> union"),
    ("cms_point_frequency_estimates", "d-cell explode absorbed by map-side partial agg -> broadcast probe join"),
    ("wordpiece_merge_table", "per-round pair+unigram aggs, broadcast likelihood argmax, narrow fuse"),
    ("wordpiece_segmentation_stats", "vocabulary-sized iterative broadcast probe; corpus weighs in once"),
    ("event_value_drift_bins", "one scan, two pivoted bin aggs, broadcast totals"),
    ("unigram_vocab_hard_em", "vocab-sized EM structures: edge probe, bounded paths, window top-1"),
    ("wordpiece_merge_table_blockgreedy", "pass-level pair+unigram aggs checkpointed; <=batch disjoint argmax scans + one narrow chained fuse per pass"),
    ("bm25_delete_crash_heal_certificate", "tombstone-healed dims: affected-term recount joins bucketed postings exchange-free"),
    ("heavy_hitters_windowed_mg", "stored per-day MG rows -> candidate union -> sliver-only window recount"),
    ("drift_from_stored_histograms", "stored bin rows only: day-window grouping, no corpus rescan"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dataworks_aws_corporate_data_ingestion_spark.session import get_session
    from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

    spark = get_session(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        f"Regenerate with `python tools/dump_plans.py` (sf_dir={sf_dir}).",
        "AQE is enabled, so exchanges shown here may coalesce or convert",
        "to broadcast at runtime; `explain` shows the initial plan.",
        "",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.rstrip(), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
