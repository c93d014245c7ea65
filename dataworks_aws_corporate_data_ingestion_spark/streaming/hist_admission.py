"""Streaming quantile-sketch admission: each micro-batch folds its
fixed-bin histogram into a stored per-day bin table, so any window's
quantile (with the rank guarantee of operators/histsketch.py) is
available over an unbounded stream without ever re-reading it.

The streaming twin of the histogram rollup
(workloads/approx_exact.py::quantile_histogram_rollup_certificate),
completing the admission matrix: every stored sketch family -- LM
counts, span grams, MG counters, bloom bitsets, and now quantile bins
-- has both a batch rollup and a replay-safe streaming admission path.

Histogram addition is an ALGEBRA (like bloom OR and KMV MIN): the
per-batch partial is itself a (day, bin, n) table and the logical state
is SUM(n) per (day, bin), so admission is a bounded append and
append == rebuild holds bit-exactly with no marker machinery needed for
the MERGE itself.  The commit markers exist only for replay idempotence
(exactly-once folding of at-least-once micro-batches), following
lm_admission.py:

  {prefix}_hist  (day date, bin long, n long, batch_token long)
                 per-batch histogram partials; <= n_bins x batch-day
                 rows per admitted batch plus one NULL-bin marker row.
  {prefix}_meta  (n_rows long, batch_token long) per-batch row counts;
                 SUM(n_rows) is the stream length and the table doubles
                 as the replay ledger.

Crash atomicity: appends run _hist -> _meta; on replay each table is
appended only if it lacks the batch token, so every crash window heals:

  crash before any append -> replays as a fresh batch
  crash after _hist only  -> replay appends only _meta
  crash after both        -> replay is a no-op

What the stored state buys at 100 TB/day: each batch contributes at
most n_bins x days(batch) integer rows (kilobytes); any date window's
p50/p99 is one SUM over stored rows plus a driver walk over <= n_bins
integers (histsketch.bin_for_rank), history never rescanned, and the
estimate still carries the hard rank guarantee because the merged bins
are bit-identical to a one-shot histogram of the whole stream --
certified end-to-end by `quantile_admission_streaming_certificate`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.histsketch import daily_histogram
from .admission import (
    admit_ledger_once,
    append_once,
    compact_index,
    init_state_tables,
    probe_with_summary,
    read_ledger_total,
    refresh_state_tables,
)

_HIST_SCHEMA = "day date, bin long, n long, batch_token long"


def init_hist_index(spark: SparkSession, prefix: str) -> None:
    """Create the (empty) per-day bin table and batch ledger.
    Idempotent across sessions sharing a warehouse dir."""
    init_state_tables(
        spark,
        {
            f"{prefix}_hist": _HIST_SCHEMA,
            f"{prefix}_meta": "n_rows long, batch_token long",
        },
    )


def admit_hist_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    n_bins: int,
    span_cents: int,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    batch_token: int | None = None,
) -> int:
    """One admission round: fold the batch's per-day histogram into the
    stored state (append-only, commit-marked, replay-safe).  Returns
    the batch_token used.

    The batch's partial is bounded (<= n_bins x distinct-days rows --
    a sketch, never the batch itself) so it is collected and written as
    one small append together with its commit marker, like the MG
    candidate appends."""
    refresh_state_tables(spark, f"{prefix}_hist", f"{prefix}_meta")

    def _hist_parts() -> list:
        return daily_histogram(
            batch_df, ts_col, value_col, n_bins, span_cents
        ).collect()

    # probe (fused token+measure+markers job, r10) and the batch's
    # histogram job run concurrently -- read wall = max, not sum (see
    # probe_with_summary); appends stay strictly after both, in order.
    token, measure, done, part = probe_with_summary(
        spark, batch_df, id_col, None,
        (f"{prefix}_hist", f"{prefix}_meta"), _hist_parts, batch_token,
    )

    def _bin_rows() -> list[tuple]:
        rows = [(r["day"], int(r["bin"]), int(r["n"]), token) for r in part]
        rows.append((None, None, 0, token))  # commit marker
        return rows

    append_once(
        spark, f"{prefix}_hist", _HIST_SCHEMA, token, _bin_rows,
        committed=f"{prefix}_hist" in done,
    )
    admit_ledger_once(
        spark, f"{prefix}_meta", token, batch_df, measure=measure,
        committed=f"{prefix}_meta" in done,
    )
    refresh_state_tables(spark, f"{prefix}_hist", f"{prefix}_meta")
    return token


def read_hist_state(
    spark: SparkSession, prefix: str
) -> tuple[DataFrame, int]:
    """Logical state: (daily(day, bin, n), n_total).  NULL-bin rows are
    commit markers (zero count, no bin) -- excluded here.  The daily
    frame is exactly a histsketch daily_histogram of every admitted
    row, because per-(day, bin) integer addition is associative and
    commutative over any batch decomposition."""
    refresh_state_tables(spark, f"{prefix}_hist")
    daily = (
        spark.table(f"{prefix}_hist")
        .filter(F.col("bin").isNotNull())
        .groupBy("day", "bin")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    return daily, read_ledger_total(spark, f"{prefix}_meta")


def compact_hist_index(spark: SparkSession, prefix: str) -> dict:
    """Fold the append-only partials to one row per (day, bin).  The
    distinct batch_token set survives as NULL-bin marker rows so
    replayed batches still heal after compaction.  Only safe when no
    batches are in flight (caller contract)."""

    def _fold(data: DataFrame) -> list[tuple]:
        folded = (
            data.groupBy("day", "bin")
            .agg(F.sum("n").cast("bigint").alias("n"))
            .collect()
        )
        return [(r["day"], int(r["bin"]), int(r["n"]), None) for r in folded]

    return compact_index(
        spark,
        f"{prefix}_hist",
        _HIST_SCHEMA,
        "bin",
        _fold,
        lambda tok: (None, None, 0, tok),
    )


def quantile_bins_from_state(
    spark: SparkSession, prefix: str, quantiles: list[float]
) -> tuple[list[tuple[int, int]], int, dict[float, int]]:
    """Merged bins, total mass, and for each requested quantile the bin
    its rank falls in (histsketch.bin_for_rank) -- the stored-state
    quantile read path.  Raises if the ledger total disagrees with the
    histogram mass (the invariant that every admitted row landed in
    exactly one bin)."""
    from math import ceil

    from ..operators.histsketch import bin_for_rank
    from .hist_admission import read_hist_state  # self-import for clarity

    daily, n_total = read_hist_state(spark, prefix)
    merged = daily.groupBy("bin").agg(F.sum("n").cast("bigint").alias("n"))
    bins = [(int(r["bin"]), int(r["n"])) for r in merged.collect()]
    mass = sum(c for _, c in bins)
    if mass != n_total:
        raise AssertionError(
            f"ledger/histogram divergence: meta n={n_total}, mass={mass}"
        )
    picks = {q: bin_for_rank(bins, ceil(q * mass)) for q in quantiles}
    return bins, mass, picks
