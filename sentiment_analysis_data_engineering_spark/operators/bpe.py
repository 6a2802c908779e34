"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer
side of the training-data pipeline.

Extension layer. Classic BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm):
repeatedly merge the most frequent adjacent symbol pair across the
corpus's word-frequency table.

Spark-first shape — the part that matters at 100 TB:
- The corpus is scanned ONCE, into a (word, freq) vocabulary frame.
  Every training iteration runs over the VOCABULARY (bounded by
  distinct words), never the corpus.
- Per iteration: adjacent pairs via `arrays_zip(slice, slice)` +
  explode (narrow), one map-side-combining weighted count, and an
  argmax read of exactly ONE row (bounded action, model-build class —
  the merge decision IS driver state, like IVF centroids).
- Merge application is a pure JVM fold (`F.aggregate` over the symbol
  array with a when/otherwise accumulator) — no Python in the loop —
  and reproduces greedy left-to-right pairing exactly ("aaaa" +
  (a,a) → [aa, aa]).
- `localCheckpoint` per iteration keeps lineage flat (the dedup-CC
  recipe) since each round's symbols feed the next.

Ties break (count DESC, left ASC, right ASC) so learned merges are
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "bpe_train", "apply_merges"]


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass: whitespace-token vocabulary with frequencies —
    the only corpus-sized stage of BPE training. Output (word, freq)."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-pair merge as a JVM fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame,
    *,
    word_col: str = "word",
    freq_col: str = "freq",
    n_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) frame;
    returns [(left, right, pair_count), ...] in merge order. Stops
    early when the best remaining pair occurs fewer than ``min_count``
    times (weighted by word frequency).

    Each iteration shuffles only vocabulary-bounded pair counts and
    collects exactly one argmax row; symbol frames are
    localCheckpoint-ed so iteration k+1 reads materialized k, not a
    k-deep lineage.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    sym = words.select(
        F.col(freq_col).alias("freq"),
        F.split(F.col(word_col), "").alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            sym.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias(
                            "l"
                        ),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias(
                            "r"
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        top = (
            pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        left, right, count = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, count))
        nxt = sym.select("freq", _merge_fold(F.col("syms"), left, right).alias("syms"))
        nxt = nxt.localCheckpoint(eager=True)
        sym.unpersist()
        sym = nxt
    sym.unpersist()
    return merges


def apply_merges(
    syms: Column, merges: list[tuple[str, str, int]] | list[tuple[str, str]]
) -> Column:
    """Segment a symbol array with learned merges, applied in rank
    order — a chain of JVM folds, no Python. Concatenating the result
    always reconstructs the input (BPE merges never drop characters)."""
    out = syms
    for m in merges:
        out = _merge_fold(out, m[0], m[1])
    return out
