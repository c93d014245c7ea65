"""Degenerate-input robustness: empty frames and no-match joins must
flow through the operators without errors and with the right shapes.
An engine that 100 TB pipelines call unsupervised cannot throw on the
day a filter matches nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_aws_corporate_data_ingestion_spark.operators.merge import merge_snapshot
from dataworks_aws_corporate_data_ingestion_spark.operators.packing import pack_sequences
from dataworks_aws_corporate_data_ingestion_spark.operators.sharding import shuffle_shards
from dataworks_aws_corporate_data_ingestion_spark.streaming.joins import (
    interval_join_attribution,
)


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string, n_tokens bigint")


def test_merge_snapshot_empty_dailies(spark):
    snap = spark.createDataFrame(
        [("a", "INSERT", "v1", "0")], "id string, db_type string, val string, id_part string"
    )
    out = merge_snapshot(snap, snap.limit(0))
    assert out.count() == 1


def test_merge_snapshot_empty_snapshot(spark):
    dailies = spark.createDataFrame(
        [("a", "INSERT", "v1", "0")], "id string, db_type string, val string, id_part string"
    )
    out = merge_snapshot(dailies.limit(0), dailies)
    assert out.count() == 1


def test_shuffle_shards_empty(spark):
    d = _empty_docs(spark)
    out = shuffle_shards(d.select("doc_id"), "doc_id", 8)
    assert out.count() == 0
    assert set(out.columns) >= {"doc_id", "shard", "pos"}


def test_pack_sequences_empty(spark):
    d = _empty_docs(spark).select("doc_id", "n_tokens")
    out = pack_sequences(d, budget=512)
    assert out.count() == 0


def test_interval_join_no_matches(spark):
    views = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00")], "event_id bigint, user_id bigint, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), F.lit(0.0).alias("value"))
    purchases = views.filter(F.lit(False))
    inner = interval_join_attribution(views, purchases)
    assert inner.count() == 0
    outer = interval_join_attribution(views, purchases, how="leftOuter")
    rows = outer.collect()
    assert len(rows) == 1 and rows[0]["purchase_id"] is None


def test_registered_queries_survive_empty_corpus(spark, tmp_path):
    """Run representative registered queries against an EMPTY documents
    table (schema-correct zero-row parquet written into a synthetic
    sf_dir): zero-row output, no division-by-zero, no window crash.
    filter(lit(False)) on the OUTPUT would be vacuous -- Catalyst prunes
    the whole plan to an empty relation -- so the emptiness goes in at
    the SOURCE."""
    from dataworks_aws_corporate_data_ingestion_spark.workload import QUERIES

    sf_dir = str(tmp_path / "empty_sf")
    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    empty.write.parquet(f"{sf_dir}/documents.parquet")
    for name in (
        "quality_threshold_sweep",
        "text_stats",
        "training_shards",
        "documents_k_per_source",
        "documents_deterministic_sample",
    ):
        assert QUERIES[name].fn(spark, sf_dir).count() == 0, name


def test_snapshot_diff_all_classes(spark):
    """added / removed / changed / unchanged, including NULL->value
    transitions (null-safe compare must call them changed)."""
    from dataworks_aws_corporate_data_ingestion_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "id int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")], "id int, v string"
    )
    out = {r["id"]: r["status"] for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_expectation_report_counts_violations(spark):
    """Violations count correctly, NULL predicates are violations (not
    silent passes), and duplicate/null keys fail uniqueness."""
    from dataworks_aws_corporate_data_ingestion_spark.operators.profile import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c"), (None, "d"), (-5, "e")],
        "id int, txt string",
    )
    out = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in expectation_report(
            df,
            [("id_positive", F.col("id") >= 0), ("txt_present", F.col("txt").isNotNull())],
            unique_keys=["id"],
        ).collect()
    }
    # id >= 0: -5 fails, NULL id fails (null predicate = violation)
    assert out["id_positive"] == (2, False)
    assert out["txt_present"] == (1, False)
    # unique(id): 5 rows, distinct non-null ids = {1,2,-5} -> 2 violations
    assert out["unique(id)"] == (2, False)


def test_expectation_report_empty_batch_passes(spark):
    """An empty batch must report 0 violations / passed=True for every
    rule -- SUM over zero rows is NULL without the coalesce, giving a
    NULL verdict the gate can neither pass nor fail."""
    from dataworks_aws_corporate_data_ingestion_spark.operators.profile import (
        expectation_report,
    )

    df = spark.createDataFrame([], "id int, txt string")
    out = expectation_report(
        df, [("id_positive", F.col("id") >= 0)], unique_keys=["id"]
    ).collect()
    assert {(r["rule"], r["n_violations"], r["passed"]) for r in out} == {
        ("id_positive", 0, True),
        ("unique(id)", 0, True),
    }


def test_expectation_report_no_rules_and_quoted_names(spark):
    from dataworks_aws_corporate_data_ingestion_spark.operators.profile import (
        expectation_report,
    )

    df = spark.createDataFrame([(1,)], "id int")
    assert expectation_report(df, []).count() == 0
    out = expectation_report(df, [("id's positive", F.col("id") >= 0)]).collect()
    assert out[0]["rule"] == "id's positive" and out[0]["passed"]


def test_pit_forms_agree_under_timestamp_ties(spark):
    """Two SCD2 versions sharing a valid_from (same-timestamp updates):
    the earlier interval is empty, so the LATER version must win in
    BOTH point-in-time forms -- the asof form needs the version-ordinal
    tiebreak for this."""
    import datetime as dt

    from dataworks_aws_corporate_data_ingestion_spark.operators.asof import asof_join
    from dataworks_aws_corporate_data_ingestion_spark.operators.scd import scd2_history

    t = dt.datetime(2024, 1, 1, 10, 0)
    events = spark.createDataFrame(
        [
            (1, t, 7, "view"),
            (2, t, 7, "purchase"),  # same ts: island 2 starts at t too
            (3, t + dt.timedelta(hours=1), 7, "purchase"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    dim = scd2_history(
        events, key="user_id", attr="event_type", ts="ts",
        tiebreak="event_id", version_col="version",
    ).select("user_id", F.col("event_type").alias("state"), "valid_from", "version")
    facts = events.filter(F.col("event_id") == 3).select("event_id", "user_id", "ts")

    # interval form (valid_to bounds come from the full scd2 output)
    dim_full = scd2_history(
        events, key="user_id", attr="event_type", ts="ts",
        tiebreak="event_id", version_col="version",
    )
    iv = facts.join(
        dim_full.select(
            F.col("user_id").alias("du"), F.col("event_type").alias("state"),
            "valid_from", "valid_to",
        ),
        (F.col("user_id") == F.col("du"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select("event_id", "state").collect()

    ao = asof_join(
        facts, dim, on=["user_id"], left_ts="ts", right_ts="valid_from",
        value_cols=["state"], tiebreak="version", suffix="_pit",
    ).select("event_id", F.col("state_pit").alias("state")).collect()

    assert [r["state"] for r in iv] == ["purchase"]
    assert [r["state"] for r in ao] == ["purchase"]
