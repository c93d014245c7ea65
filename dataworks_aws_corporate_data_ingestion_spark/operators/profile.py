"""Column profiling: per-column null/distinct/min/max stats in one pass.

The ANALYZE-style data-quality report every ingestion pipeline runs
before trusting a new batch: row count, null count, exact distinct
count, and min/max per column, emitted as one ROW PER COLUMN so the
report is joinable/diffable against yesterday's.

Scale notes: one aggregate pass over the input produces a single wide
row (Catalyst plans the multiple COUNT DISTINCTs via Expand -- input
rows duplicate x columns before the partial aggregate, so profile the
columns you need, not *).  The wide row unpivots to the per-column
report via stack() -- driver never sees data, only the final
n_columns-row frame.  At 100 TB swap exact count_distinct for
approx_count_distinct per column; exact is kept here because it is the
cross-engine-checkable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    per requested column; min/max rendered as strings so one report
    schema covers every column type."""
    wide = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.count_distinct(c).alias(f"nd_{c}") for c in cols],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in cols],
    )
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args})"
        " AS (column_name, __nn, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("__nn")).cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def expectation_report(
    df: DataFrame,
    rules: "list[tuple[str, F.Column]]",
    unique_keys: "list[str] | None" = None,
) -> DataFrame:
    """Data-contract gate: evaluate every expectation in ONE aggregate
    pass and emit (rule, n_rows, n_violations, passed) per rule -- the
    report an ingestion job checks before promoting a batch to
    training (the engine's Great-Expectations-shaped primitive, config
    as code: a rule is just (name, boolean Column)).

    A row VIOLATES a rule when the predicate is not TRUE -- NULL
    counts as a violation, so `col > 0` catches nulls without every
    rule spelling isNotNull.  `unique_keys` adds a uniqueness
    expectation per listed column (violations = n_rows - n_distinct,
    counting nulls as duplicates of nothing: distinct ignores null, so
    a null key is always a violation).

    Scale notes: all predicate counts ride one map-side-partial
    aggregate (a single wide row); uniqueness adds count_distinct via
    Expand like profile_columns.  No per-rule passes, no driver-side
    row inspection; the unpivot to rule rows handles a
    rules-count-sized frame."""
    unique_keys = unique_keys or []
    if not rules and not unique_keys:
        # stack(0, ...) does not parse; an empty contract is an empty,
        # schema-correct report
        return df.sparkSession.createDataFrame(
            [], "rule string, n_rows bigint, n_violations bigint, passed boolean"
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    names: list[str] = []
    for i, (name, pred) in enumerate(rules):
        # coalesce: SUM over zero rows is NULL, and an EMPTY batch must
        # report 0 violations / passed, not a NULL verdict
        aggs.append(
            F.coalesce(F.sum(F.when(pred, 0).otherwise(1)), F.lit(0))
            .cast("bigint")
            .alias(f"v_{i}")
        )
        names.append(name)
    base = len(rules)
    for j, k in enumerate(unique_keys):
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.col(k)))
            .cast("bigint")
            .alias(f"v_{base + j}")
        )
        names.append(f"unique({k})")
    wide = df.agg(*aggs)
    # rule names are caller config: escape backslashes (Spark SQL string
    # literals treat \\ as an escape char) and then quotes so they cannot
    # break (or inject into) the stack() expression
    stack_args = ", ".join(
        "'{}', v_{}".format(name.replace("\\", "\\\\").replace("'", "''"), i)
        for i, name in enumerate(names)
    )
    return wide.selectExpr(
        "n_rows", f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"
    ).select(
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
