"""Streaming Misra-Gries heavy-hitter admission: each micro-batch folds
its bounded MG summary into a stored candidate table, so hot keys can be
tracked over an unbounded stream with state that never exceeds
k-counters-per-batch appends (and compacts back to <= k rows).

The streaming twin of operators/heavyhitters.py, with the same
catalog-as-state design as lm_admission.py / span_admission.py:
cross-batch state is two tables --

  {prefix}_mg    (key string, c long, batch_token long) partial MG
                 summaries, one append per admitted batch (<= k real
                 rows + one NULL-key marker row).  The LOGICAL summary
                 is SUM(c) per key (read_mg_state); mergeable-summary
                 errors add like the bound, so a key with TRUE stream
                 frequency > n/(k+1) always survives with a positive
                 folded counter (per-batch undercount is <= n_b/(k+1)
                 and the undercounts sum to <= n/(k+1)).
  {prefix}_meta  (n_rows long, batch_token long) per-batch row counts;
                 SUM(n_rows) is the stream length n the threshold
                 needs, and the table doubles as the replay ledger.

Replay idempotence + crash atomicity follow lm_admission.py exactly:
the deterministic batch_token (foreachBatch batch_id, else the
sum/xor/count content hash of the batch's id set) is a per-table commit
marker; appends run _mg -> _meta, and on replay each table is appended
only if it lacks the token, so every crash window heals without
double-counting:

  crash before any append -> replays as a fresh batch
  crash after _mg only    -> replay appends only _meta
  crash after both        -> replay is a no-op

What the stored state buys at 100 TB/day: the candidate set (with
lower-bound counts) is maintained in kilobytes per batch and the stream
is never re-read; when EXACT heavy-hitter counts are wanted, the
candidates are a guaranteed superset, so one broadcast-semi-join
recount over the accumulated corpus (the archived daily partitions)
yields the exact GROUP BY + HAVING answer -- certified end-to-end by
the `mg_admission_streaming_certificate` registry entry, which drives
batch-shaped slices through this admission round, compacts
mid-sequence, exact-verifies off the final state, and hash-matches the
one-shot oracle.

Counter semantics under compaction: compact_mg_index folds partials to
one row per key and MAY re-trim to k via the MG merge rule (subtract
the (k+1)-th largest folded counter) -- the superset guarantee
survives because trimming a merged summary is itself a valid MG merge
(Agarwal et al., "Mergeable Summaries", PODS 2012).  Tokens survive as
NULL-key zero-count marker rows, like the LM/span compactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.heavyhitters import _mg_reduce, mg_summary
from .admission import (
    admit_ledger_once,
    append_once,
    compact_index,
    init_state_tables,
    probe_with_summary,
    read_ledger_total,
    refresh_state_tables,
)

_MG_SCHEMA = "key string, c long, batch_token long"


def init_mg_index(spark: SparkSession, prefix: str) -> None:
    """Create the (empty) partial-summary table and batch ledger.
    Idempotent across sessions sharing a warehouse dir."""
    init_state_tables(
        spark,
        {
            f"{prefix}_mg": _MG_SCHEMA,
            f"{prefix}_meta": "n_rows long, batch_token long",
        },
    )


def admit_mg_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    prefix: str,
    key_col: str = "key",
    k: int = 127,
    id_col: str | None = None,
    batch_token: int | None = None,
    weight_col: str | None = None,
) -> int:
    """One admission round: fold the batch's Misra-Gries summary into
    the stored state (append-only, commit-marked, replay-safe).
    Returns the batch_token used.

    With `weight_col` (non-negative integer weights) the counters and
    the ledger track weighted mass -- the SpaceSaving generalisation
    (cf. heavy_hitters_exact(weight_col=)); a prefix must use one mode
    consistently.

    The batch's per-partition summaries (<= k rows each, bounded state)
    are collected -- candidate-set-sized, never the batch itself -- and
    merged driver-side with the MG reduce rule before the append, so
    each admitted batch contributes at most k real rows.

    The probe (one fused job: replay token + ledger measure + marker
    sets, r10) and the batch's MG summary job run CONCURRENTLY via
    probe_with_summary -- the round's read wall is max(probe, summary)
    instead of their sum; appends still run strictly AFTER both, in the
    fixed _mg -> _meta order the crash-window guarantee needs."""
    refresh_state_tables(spark, f"{prefix}_mg", f"{prefix}_meta")

    def _summary_parts() -> list:
        sel = [F.col(key_col).alias("key")] + (
            [F.col(weight_col).alias("__w")] if weight_col else []
        )
        return mg_summary(
            batch_df.select(*sel), ["key"], k,
            weight_col="__w" if weight_col else None,
        ).collect()

    token, measure, done, parts = probe_with_summary(
        spark, batch_df, id_col or key_col, weight_col,
        (f"{prefix}_mg", f"{prefix}_meta"), _summary_parts, batch_token,
    )

    def _mg_rows() -> list[tuple]:
        state: dict[tuple, int] = {}
        for r in parts:
            state[(r["key"],)] = state.get((r["key"],), 0) + int(r["c"])
        state = _mg_reduce(state, k)
        rows = [(key[0], c, token) for key, c in state.items()]
        rows.append((None, 0, token))  # commit marker
        return rows

    append_once(
        spark, f"{prefix}_mg", _MG_SCHEMA, token, _mg_rows,
        committed=f"{prefix}_mg" in done,
    )
    admit_ledger_once(
        spark, f"{prefix}_meta", token, batch_df, weight_col=weight_col,
        measure=measure, committed=f"{prefix}_meta" in done,
    )
    refresh_state_tables(spark, f"{prefix}_mg", f"{prefix}_meta")
    return token


def read_mg_state(
    spark: SparkSession, prefix: str
) -> tuple[DataFrame, int]:
    """Logical state: (candidates(key, c_lower), n_total).  Candidates
    are a superset of every key with stream frequency > n_total/(k+1);
    c_lower is the folded MG lower-bound counter."""
    refresh_state_tables(spark, f"{prefix}_mg")
    cands = (
        spark.table(f"{prefix}_mg")
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("c").cast("bigint").alias("c_lower"))
    )
    return cands, read_ledger_total(spark, f"{prefix}_meta")


def compact_mg_index(
    spark: SparkSession, prefix: str, k: int | None = None
) -> dict:
    """Fold the append-only partials to one row per key, optionally
    re-trimming to <= k rows with the MG merge rule (a valid merge, so
    the superset guarantee survives).  The distinct batch_token set is
    preserved as NULL-key marker rows so replayed batches still heal.
    Only safe when no batches are in flight (caller contract)."""

    def _fold(data: DataFrame) -> list[tuple]:
        folded_rows = (
            data.groupBy("key")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .collect()
        )
        state = {(r["key"],): int(r["c"]) for r in folded_rows}
        if k is not None:
            state = _mg_reduce(state, k)
        return [(key[0], c, None) for key, c in state.items()]

    return compact_index(
        spark,
        f"{prefix}_mg",
        _MG_SCHEMA,
        "key",
        _fold,
        lambda tok: (None, 0, tok),
    )


def heavy_hitters_from_state(
    spark: SparkSession,
    corpus_df: DataFrame,
    prefix: str,
    key_expr,
    k: int,
    weight_expr=None,
    return_total: bool = False,
):
    """EXACT heavy hitters of the accumulated stream, verified off the
    streamed candidate state: broadcast the stored candidates, recount
    only them over the archived corpus, filter by the ledger's total.
    `key_expr` must reproduce the admitted key from a corpus row; pass
    `weight_expr` iff the prefix was admitted with a weight_col.

    Raises if the ledger total disagrees with the corpus total (row
    count, or weight sum in weighted mode) -- the invariant that the
    archive and the admission ledger describe the same stream.

    With `return_total` the verified total comes back alongside the
    DataFrame as (df, n_total) so callers that need the denominator
    (the certificates' share_bps) skip a second ledger read -- and in
    weighted mode a second full corpus weight scan -- of a value this
    function just proved equal to both (r11; same class as the r10
    ledger-total reuse).

    The kilobyte ledger read and the corpus count are independent jobs,
    so they run concurrently from a driver thread (guide section 2.6):
    the verify's read wall is max(corpus scan, ledger read)."""
    from concurrent.futures import ThreadPoolExecutor

    def _corpus_total() -> int:
        if weight_expr is not None:
            return int(
                corpus_df.agg(
                    F.sum(weight_expr).cast("bigint")
                ).collect()[0][0]
                or 0
            )
        return corpus_df.count()

    with ThreadPoolExecutor(max_workers=1) as pool:
        corpus_future = pool.submit(_corpus_total)
        cands, n_total = read_mg_state(spark, prefix)
        n_corpus = corpus_future.result()
    if n_corpus != n_total:
        raise AssertionError(
            f"ledger/corpus divergence: meta n={n_total}, corpus={n_corpus}"
        )
    if weight_expr is not None:
        keyed = corpus_df.select(
            key_expr.alias("key"), weight_expr.alias("__w")
        )
        measure = F.sum("__w").cast("bigint").alias("n_rows")
    else:
        keyed = corpus_df.select(key_expr.alias("key"))
        measure = F.count(F.lit(1)).cast("bigint").alias("n_rows")
    heavy = (
        keyed.join(F.broadcast(cands.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(measure)
        .filter(F.col("n_rows") * (k + 1) > F.lit(n_total))
    )
    return (heavy, n_total) if return_total else heavy
