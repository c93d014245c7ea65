"""Python UDTFs (table functions) -- one input row to many output rows
with computed columns.

The reference has no UDTF surface (SURVEY.md section 2.10); this is the
engine's demonstration of the shape for training-data prep: a document
chunker producing overlapping token windows, the standard pre-tokenise
step before embedding/packing.  Arrow-optimised (`useArrow=True`) so
batches cross the JVM boundary columnar, same as the pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_idx bigint, chunk_text string, n_tokens bigint",
    useArrow=True,
)
class ChunkDocument:
    """Overlapping token-window chunks: window `size` tokens, stride
    `stride` (overlap = size - stride).  Chunk starts at every multiple
    of stride below the token count, so every token lands in at least
    one chunk and tails shorter than `size` are kept."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        toks = (text or "").lower().split(" ")
        n = len(toks)
        for idx, start in enumerate(range(0, max(n, 1), stride)):
            window = toks[start : start + size]
            if not window:
                break
            yield idx, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (LATERAL chunk_document(...))."""
    spark.udtf.register("chunk_document", ChunkDocument)
