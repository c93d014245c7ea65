"""Streaming Count-Min admission: each micro-batch folds its bounded
d x w cell partial into a stored counter table, so ANY key's frequency
estimate is available over an unbounded stream with the CMS guarantee
(never undercounts) and without ever re-reading the stream.

The streaming twin of operators/cms.py, keeping the admission matrix
square: LM counts, span grams, MG counters, bloom bitsets, quantile
bins and now CMS cells all have batch rollup + replay-safe streaming
admission.  Counter addition is an ALGEBRA (sum per cell), so
append == rebuild holds bit-exactly; commit markers exist only for
replay idempotence, following lm_admission.py:

  {prefix}_cms   (row int, col long, c long, batch_token long)
                 per-batch cell partials; <= d*w rows per admitted
                 batch plus one NULL-row marker row.
  {prefix}_meta  (n_rows long, batch_token long) per-batch row counts;
                 SUM(n_rows) is the stream length (the denominator of
                 the CMS error envelope) and the replay ledger.

Crash atomicity: appends run _cms -> _meta; on replay each table is
appended only if it lacks the batch token, so every crash window heals
without double-counting.

At 100 TB/day each batch contributes kilobytes of state; a point
estimate reads <= d*w stored integers.  Certified end-to-end by
`cms_admission_streaming_certificate`: N-batch admission + replay +
mid-sequence compaction, final state asserted bit-identical to a
one-shot sketch, and the estimate table hash-matched against the same
plain-SQL oracle the batch entry uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cms import cms_sketch
from .admission import (
    admit_ledger_once,
    append_once,
    compact_index,
    init_state_tables,
    probe_with_summary,
    read_ledger_total,
    refresh_state_tables,
)

_CMS_SCHEMA = "row int, col long, c long, batch_token long"


def init_cms_index(spark: SparkSession, prefix: str) -> None:
    """Create the (empty) cell table and batch ledger.  Idempotent
    across sessions sharing a warehouse dir."""
    init_state_tables(
        spark,
        {
            f"{prefix}_cms": _CMS_SCHEMA,
            f"{prefix}_meta": "n_rows long, batch_token long",
        },
    )


def admit_cms_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    w: int,
    d: int,
    key_col: str = "key",
    id_col: str | None = None,
    batch_token: int | None = None,
    weight_col: str | None = None,
) -> int:
    """One admission round: fold the batch's cell partial into the
    stored state (append-only, commit-marked, replay-safe).  Returns
    the batch_token used.  The partial is bounded (<= d*w rows -- a
    sketch, never the batch), so it is collected and written as one
    small append together with its commit marker.

    With `weight_col` (non-negative integer weights) the cells and the
    ledger accumulate weight MASS -- the weighted CMS over a stream
    (cf. admit_mg_batch(weight_col=)); a prefix must use one mode
    consistently."""
    refresh_state_tables(spark, f"{prefix}_cms", f"{prefix}_meta")

    def _sketch_parts() -> list:
        return cms_sketch(
            batch_df, key_col, w, d, weight_col=weight_col
        ).collect()

    # probe (fused token+measure+markers job, r10) and the batch's
    # sketch job run concurrently -- read wall = max, not sum (see
    # probe_with_summary); appends stay strictly after both, in order.
    token, measure, done, part = probe_with_summary(
        spark, batch_df, id_col or key_col, weight_col,
        (f"{prefix}_cms", f"{prefix}_meta"), _sketch_parts, batch_token,
    )

    def _cell_rows() -> list[tuple]:
        rows = [(int(r["row"]), int(r["col"]), int(r["c"]), token)
                for r in part]
        rows.append((None, None, 0, token))  # commit marker
        return rows

    append_once(
        spark, f"{prefix}_cms", _CMS_SCHEMA, token, _cell_rows,
        committed=f"{prefix}_cms" in done,
    )
    admit_ledger_once(
        spark, f"{prefix}_meta", token, batch_df, weight_col=weight_col,
        measure=measure, committed=f"{prefix}_meta" in done,
    )
    refresh_state_tables(spark, f"{prefix}_cms", f"{prefix}_meta")
    return token


def read_cms_state(
    spark: SparkSession, prefix: str
) -> tuple[DataFrame, int]:
    """Logical state: (sketch(row, col, c), n_total).  NULL-row rows
    are commit markers -- excluded.  The folded sketch equals a
    one-shot cms_sketch of every admitted row (cell addition is
    associative/commutative over any batch decomposition)."""
    refresh_state_tables(spark, f"{prefix}_cms")
    sketch = (
        spark.table(f"{prefix}_cms")
        .filter(F.col("row").isNotNull())
        .groupBy("row", "col")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return sketch, read_ledger_total(spark, f"{prefix}_meta")


def compact_cms_index(spark: SparkSession, prefix: str) -> dict:
    """Fold the append-only partials to one row per cell; the distinct
    batch_token set survives as NULL-row marker rows so replayed
    batches still heal.  Only safe when no batches are in flight."""

    def _fold(data: DataFrame) -> list[tuple]:
        folded = (
            data.groupBy("row", "col")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .collect()
        )
        return [
            (int(r["row"]), int(r["col"]), int(r["c"]), None) for r in folded
        ]

    return compact_index(
        spark,
        f"{prefix}_cms",
        _CMS_SCHEMA,
        "row",
        _fold,
        lambda tok: (None, None, 0, tok),
    )
