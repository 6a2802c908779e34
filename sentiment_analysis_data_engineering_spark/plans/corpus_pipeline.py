"""End-to-end training-corpus build: the full curation chain a
pretraining data pipeline runs, composed from the engine's operators
into ONE coherent flow.

    clean/mask → quality+language gates → exact dedup →
    MinHash-LSH near-dedup (cluster → best-quality survivor) →
    benchmark decontamination → per-source cap → mixture sampling →
    sliding-window chunking → sequence packing

Every stage is an existing, individually oracle-/pytest-verified
operator; this module contributes the COMPOSITION — correct ordering
(dedup before decontamination before sampling, so removed mass never
skews the mixture solve), id plumbing between stages, and a per-stage
accounting report so a corpus build is auditable ("where did my
documents go?").

Scale: stages are lazy single plans chained on the doc_id spine; the
only materialization is the optional pinned survivor frame (three
downstream consumers). Pair-generating stages are the bucketed/banded
shapes of operators/dedup.py — nothing here introduces a new shuffle
class beyond its constituents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text as tx
from ..operators.packing import pack_sequences
from ..operators.sampling import mixture_weighted_sample

__all__ = ["curate_training_corpus"]


def curate_training_corpus(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    eval_pred: Column | None = None,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
    languages: list[str] | None = None,
    near_dup_threshold: float = 0.5,
    source_cap: int | None = None,
    mixture_weights: dict[str, float] | None = None,
    mixture_target_fraction: float = 1.0,
    chunk_size: int = 64,
    chunk_stride: int = 48,
    pack_budget: int = 256,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Run the full curation chain; returns lazy frames:

    - ``documents`` — surviving (id, source, text, n_tokens, quality,
      pred_lang) rows after every gate;
    - ``chunks`` — sliding-window segments of the survivors;
    - ``packed`` — chunk→pack assignment under ``pack_budget``;
    - ``stage_counts`` — (stage, n_docs) accounting rows, ordered by
      pipeline position: the audit trail of where mass went.

    ``eval_pred`` marks benchmark/eval rows INSIDE ``documents``; they
    are used as the decontamination reference and excluded from the
    training output. Near-dup survivor choice is highest quality, then
    smallest id — deterministic. With ``persist`` the post-dedup
    survivor frame AND the LSH signature internals are pinned
    (dedup._pin registry: call ``dedup.release_pinned()`` when done in
    a long-lived session). A NULL ``eval_pred`` result counts the row
    as training input.

    Stage order matters and is fixed: dedup BEFORE decontamination
    (contaminated duplicates die once, not per copy), decontamination
    BEFORE capping/sampling (contaminated mass must not occupy quota),
    sampling LAST so the mixture solve sees exactly the eligible set.
    """
    docs = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        tx.mask_pii(tx.clean_text(F.col(text_col))).alias("text"),
        *( [eval_pred.alias("_is_eval")] if eval_pred is not None else [] ),
    )
    if eval_pred is None:
        docs = docs.withColumn("_is_eval", F.lit(False))
    else:
        # NULL predicate results (e.g. a null label column) must count
        # as training input, not silently vanish from every branch AND
        # the accounting
        docs = docs.withColumn(
            "_is_eval", F.coalesce(F.col("_is_eval"), F.lit(False))
        )

    scored = docs.select(
        "doc_id",
        "source",
        "text",
        "_is_eval",
        tx.token_count("text").alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
        tx.lang_id("text").alias("pred_lang"),
    )

    gate = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if languages:
        gate = gate & F.col("pred_lang").isin(languages)
    gated = scored.filter(F.col("_is_eval") | gate)

    train = gated.filter(~F.col("_is_eval"))

    # exact dedup: min-id survivor per normalized text
    exact_keep = dd.exact_dedup(train, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    exact = train.join(exact_keep, "doc_id", "left_semi")

    # near-dedup: LSH pairs -> components -> best-quality survivor
    pairs = dd.minhash_lsh_pairs(
        exact, "text", "doc_id",
        verify_threshold=near_dup_threshold, persist=persist,
    )
    comp = dd.connected_components(pairs.select("id_a", "id_b"))
    labeled = exact.join(
        comp.select(F.col("id").alias("doc_id"), F.col("comp").alias("component")),
        "doc_id",
        "left",
    )
    # singletons (no dup cluster) become their own component so the
    # survivor window never lumps them together under NULL
    labeled = labeled.withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    near = (
        labeled.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "component")
    )
    if persist:
        # the survivor frame feeds decontamination, capping/sampling,
        # chunking AND four accounting branches — pin it so the
        # scoring/gating/dedup lineage runs once (released with
        # dedup.release_pinned, same registry as the LSH internals)
        near = dd._pin(near, True)

    # decontamination against the eval split (skippable when absent)
    if eval_pred is not None:
        screen_input = (
            near.select("doc_id", "text", F.lit(False).alias("_ev"))
            .unionByName(
                gated.filter(F.col("_is_eval"))
                .select("doc_id", "text", F.lit(True).alias("_ev"))
            )
        )
        flags = dd.contamination_screen(
            screen_input, "text", "doc_id", F.col("_ev")
        )
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        decon = near.join(clean_ids, "doc_id", "left_semi")
    else:
        decon = near

    # per-source cap (C4/RefinedWeb domain cap)
    if source_cap is not None:
        cw = Window.partitionBy("source").orderBy(
            F.desc("quality"), F.asc("doc_id")
        )
        capped = (
            decon.withColumn("_rk", F.row_number().over(cw))
            .filter(F.col("_rk") <= source_cap)
            .drop("_rk")
        )
    else:
        capped = decon

    # mixture re-weighting (The Pile / LLaMA-style data mixing)
    if mixture_weights:
        final = mixture_weighted_sample(
            capped, "doc_id", "source", mixture_weights,
            target_fraction=mixture_target_fraction,
        )
    else:
        final = capped
    final = final.drop("_is_eval")

    chunks = tx.chunk_token_windows(
        final, "text", "doc_id", chunk_size=chunk_size, stride=chunk_stride
    )
    # packing wants (doc_id, n_tokens): chunks get a synthetic dense id
    # loud executor-side guard FOLDED INTO the id expression (a
    # dropped standalone assert column would be pruned away by the
    # optimizer): chunk_idx >= 2^20 would bleed into the next doc's id
    # range and doc_id >= 2^42 would wrap the long — both silently
    # corrupt packing keys otherwise. assert_true returns NULL on
    # success, so the when() always takes the computed branch.
    guard = F.assert_true(
        (F.col("chunk_idx") < F.lit(1 << 20))
        & (F.col("doc_id") < F.lit(1 << 42)),
        F.lit("synthetic chunk-id range overflow (chunk_idx/doc_id)"),
    )
    chunk_rows = chunks.select(
        F.when(
            guard.isNull(),
            F.col("doc_id") * (1 << 20) + F.col("chunk_idx"),
        ).alias("doc_id"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packed = pack_sequences(
        chunk_rows, "doc_id", "n_tokens", budget=pack_budget
    )

    def _count(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(name).alias("stage"), F.count("*").alias("n_docs")
        )

    stage_counts = (
        _count("0_input", docs.filter(~F.col("_is_eval")))
        .unionByName(_count("1_gated", train))
        .unionByName(_count("2_exact_dedup", exact))
        .unionByName(_count("3_near_dedup", near))
        .unionByName(_count("4_decontaminated", decon))
        .unionByName(_count("5_source_capped", capped))
        .unionByName(_count("6_mixture_sampled", final))
    )

    return {
        "documents": final,
        "chunks": chunks,
        "packed": packed,
        "stage_counts": stage_counts,
    }
