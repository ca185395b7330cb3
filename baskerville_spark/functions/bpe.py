"""Distributed BPE merge training — the tokenizer-training step.

Reference seam: Baskerville has no tokenizer machinery (its text ops are
request-URL features); this is a from-scratch extension for the
training-data brief (the brief's "BPE-ish" token counting is the
INFERENCE side, functions/text.py — this is the TRAINING side that
produces the merge table those tokenizers run).

Shape (the one real BPE trainers use, distributed): the corpus collapses
to a WORD-FREQUENCY table in one pass (explode + groupBy — at 100 TB the
distinct-word table is ~10^8 rows, thousands of times smaller than the
corpus, and the corpus is never touched again). Each merge round is then:

1. one aggregate over the word table — adjacent-symbol pairs via
   zip_with(slice, slice) weighted by word count, summed map-side; the
   argmax row (ONE row) comes to the driver (bounded collect, like the
   IForest model — the merge list IS the model);
2. one pure-Column rewrite — ``F.aggregate``'s fold applies the merge
   leftmost-non-overlapping per word (no Python in the path), prefiltered
   by array_contains so untouched words skip the fold.

Rounds checkpoint through the same ``_Ckpt`` protocol as the connected-
components loops (graph.py): persist-before-checkpoint, superseded files
deleted, lineage truncated — n_merges=32k rounds must not build a 32k-step
plan. Words that shrink to one symbol stop producing pairs and the
``min_freq`` floor stops training when the best pair is noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baskerville_spark.functions.graph import _Ckpt

MERGES_SCHEMA = "merge_rank int, lsym string, rsym string, pair_count long"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(sym: array<string> of characters, cnt) per distinct whitespace word."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            # split-on-lookahead leaves a trailing "" element — drop it
            F.filter(
                F.split("w", "(?!^)"), lambda x: x != F.lit("")
            ).alias("sym"),
            "cnt",
        )
    )


def _apply_merge(words: DataFrame, l: str, r: str) -> DataFrame:
    """Rewrite each word's symbol array with (l, r) → l+r, leftmost-first
    non-overlapping (the fold re-reads its own output, so 'aaa' under
    (a,a) becomes [aa, a], not [aa, aa])."""
    fold = F.aggregate(
        "sym",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(l + r))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    touched = F.array_contains("sym", l) & F.array_contains("sym", r)
    return words.select(
        F.when(touched, fold).otherwise(F.col("sym")).alias("sym"), "cnt"
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merges; returns (merge_rank, lsym,
    rsym, pair_count), deterministic: pair count desc, then (lsym, rsym)
    lexicographic on ties."""
    spark = docs.sparkSession
    ckpt = _Ckpt()
    words = ckpt(word_frequencies(docs, text_col))
    merges: list[tuple[int, str, str, int]] = []
    pending = False
    for rank in range(1, n_merges + 1):
        pairs = (
            words.where(F.size("sym") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "zip_with(slice(sym, 1, size(sym) - 1),"
                        " slice(sym, 2, size(sym) - 1),"
                        " (l, r) -> struct(l, r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("l"), F.asc("r"))
        )
        best = pairs.first()  # the action that materializes this round
        if pending:
            ckpt.committed(words)
            pending = False
        if best is None or best["total"] < min_freq:
            break
        l, r, total = best["l"], best["r"], int(best["total"])
        merges.append((rank, l, r, total))
        if rank < n_merges:  # the last merge never needs applying
            words = ckpt.lazy(_apply_merge(words, l, r))
            pending = True
    return spark.createDataFrame(merges, MERGES_SCHEMA)
