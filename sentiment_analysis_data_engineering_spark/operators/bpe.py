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

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "bpe_train", "apply_merges", "encode_words"]


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
    order — JVM folds, no Python. Concatenating the result always
    reconstructs the input (BPE merges never drop characters).

    Built as ONE outer ``aggregate`` over a literal array of
    (left, right) pairs whose accumulator is the symbol array, with
    the single-pair greedy fold as the inner lambda — a CONSTANT-size
    expression tree regardless of rank count (r15, guide §5: the
    previous ``len(merges)``-deep chain of nested ``_merge_fold``
    expressions cost O(ranks) driver-side Column construction (py4j
    round trips per fold) and O(ranks) analyzer depth, overrunning the
    analyzer's fixed Resolution budget past ~100 ranks — callers had
    to chunk, and a 300-rank table burned ~56 s of pure driver time
    building the tree). Rank order is the literal array's order, so
    semantics are unchanged (pinned by test_bpe.py: greedy
    left-to-right on runs, reconstruction, 300-rank bit-equality with
    the Arrow encoder).

    BELOW 48 ranks the original chain of per-rank folds is kept: its
    literal left/right comparisons evaluate ~2-3x faster per row than
    the generic pair-variable lambda (measured +1.3 s on
    bpe_merge_stats' 8-rank table at sf0.1 when the aggregate form
    was applied unconditionally), construction cost is negligible at
    that depth, and 48 stays safely under the analyzer's
    ~100-iteration Resolution budget. Both forms are pinned
    token-identical by the test_bpe laws, which exercise 1-50-rank
    tables (chain) and the 300-rank production table (aggregate)."""
    if not merges:
        return syms
    if len(merges) < 48:
        out = syms
        for m in merges:
            out = _merge_fold(out, m[0], m[1])
        return out
    pairs = F.array(
        *[
            F.struct(F.lit(m[0]).alias("l"), F.lit(m[1]).alias("r"))
            for m in merges
        ]
    )
    return F.aggregate(
        pairs,
        syms,
        lambda acc, m: F.aggregate(
            acc,
            F.expr("CAST(array() AS array<string>)"),
            lambda a, x: F.when(
                (F.size(a) > 0)
                & (F.element_at(a, -1) == m["l"])
                & (x == m["r"]),
                F.concat(
                    F.slice(a, 1, F.size(a) - 1),
                    F.array(F.concat(m["l"], m["r"])),
                ),
            ).otherwise(F.concat(a, F.array(x))),
        ),
    )


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    word_col: str = "word",
    out_col: str = "tokens",
) -> DataFrame:
    """Corpus-scale BPE ENCODE: apply a trained merge table to every
    row of a (usually distinct-word) frame, appending ``out_col`` =
    array<string> of subword tokens. Semantics are bit-identical to
    :func:`apply_merges` (each merge greedily left-to-right, in rank
    order — property-tested against the JVM fold), but the engine is an
    Arrow-batched pandas UDF instead of a ``len(merges)``-deep nested
    ``F.aggregate`` chain: the fold chain is the right tool for the
    handful of merges the TRAINER applies per iteration, while a
    production merge table (hundreds to tens of thousands of ranks)
    literal-folds into an expression tree whose analysis/codegen cost
    grows with the vocabulary — the same big-constant-expression trap
    the PQ ADC tables hit (SNIPPETS.md). The merge list rides the UDF
    closure as driver state (bounded model-build class, like IVF
    centroids), so executors apply it with a plain Python scan per
    word: O(len(word)·ranks) worst case, over rows that should be the
    DISTINCT vocabulary — encode the vocab once, then equi-join token
    counts back to the corpus (the 100 TB shape: the Python pass is
    vocabulary-bounded, never corpus-bounded).

    Preconditions / production notes:

    - ``word_col`` values must be NON-EMPTY strings (guaranteed by
      :func:`word_frequencies`, which drops zero-length tokens). For
      an empty string this scan returns ``[]`` while
      :func:`apply_merges`' split-based JVM fold yields ``[""]`` —
      pinned unreachable by
      ``test_encode_words_empty_merge_table_is_char_split``.
    - The per-word scan applies the FULL rank list unconditionally:
      O(len(word)·ranks). Fine through a few hundred ranks (each pass
      is a tight list scan over short words); a production-size merge
      table (30k+ ranks, tokenizer-scale) over a long-tail vocabulary
      wants the standard pair-priority-queue encode (merge the
      lowest-rank pair PRESENT in the word, heap-ordered) or
      symbol-pair indexing, which is O(len·log len) per word
      independent of table size. The call shape (distinct-vocab rows,
      closure-carried table) would not change — only this inner
      function."""
    ranked = [(m[0], m[1], m[0] + m[1]) for m in merges]

    @F.pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        def enc(w: str) -> list[str]:
            syms: list[str] = list(w)
            for left, right, joined in ranked:
                out: list[str] = []
                for x in syms:
                    # mirror _merge_fold exactly: merge when the
                    # accumulator's LAST symbol is `left` and the
                    # incoming one is `right` (a just-merged 2+-char
                    # symbol can never equal the 1-char-or-longer
                    # `left` it was built from, so greedy
                    # left-to-right non-overlap holds)
                    if out and out[-1] == left and x == right:
                        out[-1] = joined
                    else:
                        out.append(x)
                syms = out
            return syms

        return col.map(enc)

    return words.withColumn(out_col, _enc(F.col(word_col)))
