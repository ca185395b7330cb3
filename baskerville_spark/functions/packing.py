"""Sequence packing: assign documents to fixed-size context-window bins.

Pretraining pipelines concatenate documents (in a deterministic order) into
one token stream and cut it into fixed-length context windows; each document
is attributed to the window where it STARTS. That attribution is a global
prefix sum over token counts — trivial in one process, but the naive Spark
form (``Window.orderBy(id)`` with no partitionBy) coalesces the whole table
into ONE task, which is exactly the kind of plan that works at 60k rows and
dies at 100 TB.

``pack_sequences`` implements the classic two-phase distributed prefix sum:

1. ``repartitionByRange(id)`` gives contiguous, ordered id blocks (range
   partition i holds strictly smaller ids than partition i+1 — the same
   layout a sorted Iceberg table already has, in which case the shuffle is
   free).
2. ONE tiny aggregate computes per-block token totals (P rows, P = number
   of range partitions) which the driver cumulates into per-block start
   offsets — O(P) driver work, bounded by parallelism, never by data.
3. The offsets re-enter the plan as a literal map keyed on the range
   partition id; the within-block running sum is a per-partition window
   (partitionBy block), so no task ever sees more than one block.

Token counting is whitespace tokens (`F.split(trim, '\\s+')`) — identical
to quality_features' token_count_ws; swap in token_count_bpe or a real
tokenizer count column via ``tokens_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    bin_tokens: int = 512,
    n_blocks: int | None = None,
) -> DataFrame:
    """(id, n_tokens, start_offset, bin_id): the context window each doc
    starts in when docs are concatenated in ``id_col`` order and split
    every ``bin_tokens`` tokens.

    ``tokens_col`` uses a precomputed token-count column; otherwise counts
    whitespace tokens of ``text_col``. Ids must be unique (they are the
    concatenation order). For P range blocks the literal offset map holds
    P entries — fine into the thousands; beyond that, broadcast-join a tiny
    (block, offset) frame instead (same plan shape).
    """
    tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    base = df.select(F.col(id_col).alias("id"), tok.cast("long").alias("n_tokens"))
    if n_blocks is None:
        n_blocks = base.sparkSession.sparkContext.defaultParallelism
    ranged = (
        base.repartitionByRange(n_blocks, "id")
        .withColumn("block", F.spark_partition_id())
    )
    # phase 1: ONE job over the range exchange collects per-block totals AND
    # per-block id upper bounds (P rows; bounded by parallelism, not data).
    # RangePartitioner derives its sample seed from the RDD id, which differs
    # per compiled plan — so at scale (partial sampling) running the exchange
    # a second time for the returned frame could put a row near a boundary in
    # a DIFFERENT block than the one whose offset it was credited to,
    # silently corrupting start_offset (round-4 advisor finding). The
    # collected max_id bounds make block membership a deterministic function
    # of id, so the returned frame never re-runs the range exchange at all.
    stats = sorted(
        ranged.groupBy("block")
        .agg(F.sum("n_tokens").alias("t"), F.max("id").alias("max_id"))
        .collect(),
        key=lambda r: r["block"],
    )
    if not stats:
        return base.select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.lit(0).cast("bigint").alias("start_offset"),
            F.lit(0).cast("bigint").alias("bin_id"),
        )
    offsets: list[int] = []
    acc = 0
    for r in stats:
        offsets.append(acc)
        acc += int(r["t"] or 0)
    # block = number of collected block-max bounds strictly below this id —
    # O(P) codegen work per row with P = parallelism; past a few thousand
    # blocks, broadcast-join a tiny (block, offset) frame instead.
    bounds = [r["max_id"] for r in stats[:-1]]
    if bounds:
        block = F.size(
            F.filter(
                F.array(*[F.lit(b) for b in bounds]),
                lambda b: b < F.col("id"),
            )
        )
    else:
        block = F.lit(0)
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for i, o in enumerate(offsets) for x in (i, o)]
        ),
        F.col("block"),
    )
    # phase 2: within-block running sum — partitioned window (hash shuffle
    # on block, the only exchange in the returned plan), no global sort
    w = (
        Window.partitionBy("block")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (off + F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return base.withColumn("block", block).select(
        F.col("id").alias(id_col),
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(bin_tokens)).cast("bigint").alias("bin_id"),
    )


def packed_bin_summary(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-bin rollup of ``pack_sequences`` output: doc count, token mass,
    id span — the shape a packing job reports for mix auditing."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    stride: int = 80,
) -> DataFrame:
    """Sliding-window chunking: split each document into token windows of
    ``chunk_tokens`` starting every ``stride`` tokens (overlap when
    stride < chunk_tokens) — the RAG / long-document preprocessing step.

    Pure Column algebra: split -> sequence of starts -> posexplode ->
    slice; one narrow projection, no shuffle, whole-stage codegen
    end-to-end. The chunk text is re-joined with single spaces (the
    tokenizer's inverse for whitespace tokens); chunk_md5 fingerprints it
    so content — not just counts — is under any downstream comparison.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunk = F.slice(F.col("__toks"), F.col("start_tok") + 1, chunk_tokens)
    return (
        df.select(
            F.col(id_col).alias(id_col),
            toks.alias("__toks"),
            n.alias("__n"),
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .select(
            id_col,
            "chunk_idx",
            "start_tok",
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("start_tok"))
            .cast("int")
            .alias("n_tokens_chunk"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )
