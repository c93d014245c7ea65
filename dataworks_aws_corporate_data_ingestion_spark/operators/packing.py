"""Sequence packing: group variable-length documents into fixed token
budgets (training batch construction with minimal padding).

Packing is an ordering-dependent greedy algorithm -- not expressible as
relational operators -- so this is the engine's canonical applyInPandas
shape: deterministic hash-bucketing spreads documents over the cluster,
then first-fit-decreasing runs per bucket in a single Arrow-batched
Python pass.  Cross-bucket packing quality is sacrificed for
parallelism; with uniform buckets the fill-ratio loss vs global FFD is
negligible (each bucket still packs thousands of docs) while global FFD
would serialise the corpus through one process.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int | None = None,
) -> DataFrame:
    """Pack documents into sequences of at most `budget` tokens.

    Returns one row per pack: (pack_id, doc_ids, total_tokens, n_docs,
    fill_ratio).  Documents longer than the budget get a pack of their
    own, truncation being the tokeniser's job, not the packer's.
    Deterministic: bucket assignment is a hash of the id, and FFD order
    ties break on id."""
    spark = docs.sparkSession
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism
    bucketed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket"),
    )

    schema = (
        "pack_id string, doc_ids array<bigint>, total_tokens bigint,"
        " n_docs bigint, fill_ratio double"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        bins: list[list] = []  # [remaining, ids, total]
        for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
            n_tok = int(n_tok)
            placed = False
            if n_tok < budget:
                for b in bins:
                    if b[0] >= n_tok:
                        b[0] -= n_tok
                        b[1].append(int(doc_id))
                        b[2] += n_tok
                        placed = True
                        break
            if not placed:
                bins.append([max(budget - n_tok, 0), [int(doc_id)], n_tok])
        return pd.DataFrame(
            {
                "pack_id": [f"{bucket}-{i}" for i in range(len(bins))],
                "doc_ids": [b[1] for b in bins],
                "total_tokens": [b[2] for b in bins],
                "n_docs": [len(b[1]) for b in bins],
                "fill_ratio": [min(b[2] / budget, 1.0) for b in bins],
            }
        )

    return bucketed.groupBy("bucket").applyInPandas(_pack, schema)
